package graft.sources

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}
import org.apache.spark.sql.functions._

/** Small-file COMPACTION over a hive-partitioned directory tree — the
  * layout-MAINTENANCE operator next to the three layout-CREATION
  * operators ([[PartitionedWrite]], [[ZOrderedWrite]], [[Bucketing]]).
  * At 100 TB this is what keeps a streaming warehouse scannable: every
  * micro-batch commit appends a file per task per partition directory,
  * so a month-partitioned sink at 10 commits/hour × 32 tasks grows
  * ~7.7k files/day/directory, and within weeks a full scan pays more
  * in file opens and footer reads than in row decode (the classic
  * small-file problem; Delta/Iceberg ship this verb as OPTIMIZE /
  * rewrite_data_files).
  *
  * One pass, one shuffle, per-directory ADAPTIVE width:
  *  1. Stat the tree driver-side — one filesystem listing per
  *     directory, a per-directory byte total. This is metadata
  *     proportional to |directories| (83 months here), NOT |rows|; at
  *     100 TB it is exactly what a table format's manifest gives for
  *     free.
  *  2. Broadcast the (partition value → ceil(dirBytes / targetBytes),
  *     floor 1) plan and route every row to (partCol, slot) with
  *     slot = hash(row) mod n(part) — a SINGLE full shuffle whose
  *     width adapts per directory: a 40-file 2 MB directory collapses
  *     to one write task, a 10 GB directory fans out to 80, in the
  *     same job. No per-directory rewrite jobs (the naive loop is
  *     |directories| driver-side jobs — serial scheduling overhead at
  *     83 directories, a stall at 83k).
  *  3. `write.partitionBy(partCol)` the routed rows — each shuffle
  *     task writes one file per directory value it holds, so each
  *     directory ends with AT MOST n(part) files (distinct (part,
  *     slot) pairs can hash-collide into one task, which only MERGES
  *     output files — fewer, larger; the same "up to n" contract as
  *     [[PartitionedWrite]]'s within-partition split, in reverse).
  *
  * Row content is untouched — the slot never reaches the data, only
  * the shuffle — so every oracle over the source relation holds
  * verbatim over the compacted one; [[graft.queries.CoreQueries.q51_compaction]]
  * puts that under the driver's hash gate, and CompactionSpec pins the
  * file-count contract (collapse to 1/directory at the default
  * target; multi-file adaptive widths at a small target; partition
  * pruning intact on the compacted tree).
  */
object Compaction {

  /** Per-directory (partition value → planned file count) from one
    * driver-side listing of `srcPath`. Exposed for the spec. Values
    * are hive-UNESCAPED (`%3A` → `:`, etc.) so they compare against
    * the data column's rendering, EXCEPT the null sentinel
    * [[HiveDefaultPartition]], which stays literal — the join side
    * coalesces null to it. */
  def filePlan(s: SparkSession, srcPath: String,
               targetBytes: Long): Map[String, Int] = {
    val root = new Path(srcPath)
    val fs = root.getFileSystem(s.sparkContext.hadoopConfiguration)
    fs.listStatus(root).iterator
      .filter(d => d.isDirectory && d.getPath.getName.contains("="))
      .map { d =>
        val bytes = fs.listStatus(d.getPath).iterator
          .filter(f => f.isFile && !f.getPath.getName.startsWith("_"))
          .map(_.getLen).sum
        val v = unescape(d.getPath.getName.split("=", 2)(1))
        v -> math.max(1L, (bytes + targetBytes - 1) / targetBytes).toInt
      }.toMap
  }

  private def unescape(dirValue: String): String =
    if (dirValue == HiveDefaultPartition) dirValue
    else org.apache.spark.sql.catalyst.catalog.ExternalCatalogUtils
      .unescapePathName(dirValue)

  /** Count of data files per partition directory — the spec's
    * before/after evidence. */
  def fileCounts(s: SparkSession, path: String): Map[String, Int] = {
    val root = new Path(path)
    val fs = root.getFileSystem(s.sparkContext.hadoopConfiguration)
    fs.listStatus(root).iterator
      .filter(d => d.isDirectory && d.getPath.getName.contains("="))
      .map { d =>
        unescape(d.getPath.getName.split("=", 2)(1)) ->
          fs.listStatus(d.getPath).count(f =>
            f.isFile && !f.getPath.getName.startsWith("_"))
      }.toMap
  }

  /** Hive's directory encoding for a null partition value — what
    * `partitionBy` names the directory and what [[filePlan]] therefore
    * lists for it. */
  private[sources] val HiveDefaultPartition = "__HIVE_DEFAULT_PARTITION__"

  /** Compact the hive-partitioned tree at `srcPath` (partitioned by
    * `partCol`) into `dstPath`, aiming at `targetBytes` per output
    * file, and return the read-back relation. The routing hash is over
    * ALL source columns, so the rewrite is deterministic given the
    * data (no rand(): a retried task re-routes identically —
    * speculative execution and stage retries stay exactly-once).
    *
    * Two guard rails a general-purpose maintenance operator owes its
    * caller (both r15-verdict/advice items):
    *  - the source read is `mergeSchema`: a tree whose later epochs
    *    ADDED a column (the [[graft.queries.CoreQueries.q53_schema_merge]]
    *    layout) must compact to the union-of-footers schema, not to
    *    whichever single footer Spark happens to sample — the late
    *    column survives, NULL before its epoch (CompactionSpec pins
    *    it). Planning-time footer sweep, same cost note as q53.
    *  - null partition values route null-safely: [[filePlan]] lists a
    *    null directory as `__HIVE_DEFAULT_PARTITION__`, so the plan
    *    join coalesces the cast to that sentinel instead of
    *    null-rejecting (and silently DROPPING) the whole directory.
    *    And because hive's directory encoding can still diverge from
    *    `cast(string)` rendering (URL-escaped strings, zero-padded
    *    numerics), the rewrite ASSERTS output rows == source rows —
    *    a maintenance pass must refuse to lose data, not trust its
    *    join key. The count passes are parquet footer-count scans
    *    (no columns read), noise next to the rewrite itself.
    */
  /** Compact a STREAMING file-sink output directory — the maintenance
    * gap the st family and [[compact]] jointly expose: a sink dir is
    * read through its `_spark_metadata` commit log (readers serve
    * ONLY manifest-listed files — that is the sink's exactly-once
    * read contract), so rewriting its files with the plain compactor
    * would leave a manifest pointing at deleted paths and a tree
    * Spark refuses to read. This variant keeps the contract across
    * the rewrite:
    *
    *  1. read `sinkDir` VIA its manifest (`spark.read.parquet`
    *     auto-detects `_spark_metadata`) — uncommitted stragglers
    *     from a crashed batch are never compacted in;
    *  2. size the output from the committed files' actual bytes (one
    *     driver-side stat per committed file — metadata-scale, the
    *     same |files| the read must plan anyway) and rewrite in one
    *     explicit-width shuffle, same AQE-pinning rationale as
    *     [[compact]];
    *  3. re-register: write a FRESH commit log at `dstPath` declaring
    *     the compacted files as batch 0
    *     ([[org.apache.spark.sql.graft.ColumnBridge.writeSinkManifest]]
    *     — Spark's own `FileStreamSinkLog` format, so the compacted
    *     dir reads exactly like the original sink, stray files again
    *     invisible).
    *
    * The compacted dir is a live INCREMENTAL snapshot: the original
    * query keeps appending to `sinkDir` (its checkpoint references
    * that log), and each re-invocation of this method picks up ONLY
    * the source files committed since the last compaction, compacts
    * them into fresh files APPENDED at `dstPath`, and commits them as
    * the next batch of the compacted dir's own sink log — prior
    * output is never rewritten (StreamingSpec pins name/len/mtime
    * untouched across re-compactions). Bookkeeping lives in a
    * `_graft_compaction/<gen>.sources` sidecar per increment (the
    * source files it covers), written BEFORE the increment's manifest
    * batch commits; a crash between the two leaves a TORN increment —
    * sidecar present, batch absent — which the next invocation
    * detects ([[org.apache.spark.sql.graft.ColumnBridge.sinkLogLatestBatch]])
    * and REDOES from its recorded source list. The torn attempt's
    * stray files stay manifest-invisible, so the redo duplicates
    * nothing: the same idempotent-replay recipe the st11 foreachBatch
    * sink pins, applied to maintenance.
    *
    * Unpartitioned sinks only — the shape every st entry writes; a
    * partitioned sink compacts per-directory with the same recipe.
    * Row-preservation asserted like [[compact]] on every invocation:
    * the compacted dir must always read exactly the committed rows.
    */
  def compactStreamSink(s: SparkSession, sinkDir: String, dstPath: String,
                        targetBytes: Long): DataFrame = {
    val fs = new Path(sinkDir)
      .getFileSystem(s.sparkContext.hadoopConfiguration)
    val src = s.read.parquet(sinkDir) // manifest-routed listing
    val committed = src.inputFiles.toSeq.sorted
    val sideDir = new Path(dstPath, "_graft_compaction")
    def gens(): Map[Long, Seq[String]] =
      if (!fs.exists(sideDir)) Map.empty
      else fs.listStatus(sideDir).iterator
        .filter(_.getPath.getName.endsWith(".sources"))
        .map { f =>
          val gen = f.getPath.getName.stripSuffix(".sources").toLong
          val in = fs.open(f.getPath)
          val lines = try scala.io.Source.fromInputStream(in, "UTF-8")
            .getLines().filter(_.nonEmpty).toVector
          finally in.close()
          gen -> lines
        }.toMap
    def dataFiles(): Map[String, org.apache.hadoop.fs.FileStatus] =
      if (!fs.exists(new Path(dstPath))) Map.empty
      else fs.listStatus(new Path(dstPath)).iterator
        .filter(f => f.isFile && !f.getPath.getName.startsWith("_")
          && !f.getPath.getName.startsWith("."))
        .map(f => f.getPath.getName -> f).toMap
    // one increment: compact `files` into appended output, commit as
    // sink-log batch `gen`; width sized from the increment's actual
    // bytes, never the whole sink's
    def appendIncrement(gen: Long, files: Seq[String]): Unit = {
      val before = dataFiles().keySet
      val bytes = files.map(f => fs.getFileStatus(new Path(f)).getLen).sum
      val width = math.max(1L,
        (bytes + targetBytes - 1) / targetBytes).toInt
      s.read.parquet(files: _*).repartition(width)
        .write.mode(SaveMode.Append).parquet(dstPath)
      val fresh = dataFiles().filter { case (n, _) => !before(n) }
        .values.toIndexedSeq.sortBy(_.getPath.getName)
      org.apache.spark.sql.graft.ColumnBridge
        .writeSinkManifest(s, dstPath, fresh, gen)
    }
    val recorded = gens()
    val lastBatch = org.apache.spark.sql.graft.ColumnBridge
      .sinkLogLatestBatch(s, dstPath)
    // heal torn increments first (sidecar ahead of the sink log)
    recorded.filter(_._1 > lastBatch).toSeq.sortBy(_._1)
      .foreach { case (g, files) => appendIncrement(g, files) }
    // then compact whatever the source sink committed since
    val done = recorded.values.flatten.toSet
    val fresh = committed.filterNot(done)
    if (fresh.nonEmpty) {
      val gen = (recorded.keys ++ Seq(lastBatch)).max + 1
      fs.mkdirs(sideDir)
      val tmp = new Path(sideDir, s".$gen.sources.tmp")
      val out = fs.create(tmp, true)
      try out.write((fresh.mkString("\n") + "\n").getBytes("UTF-8"))
      finally out.close()
      require(fs.rename(tmp, new Path(sideDir, s"$gen.sources")),
        s"compaction sidecar rename lost a race for gen $gen")
      appendIncrement(gen, fresh)
    }
    val out = s.read.parquet(dstPath)
    val (nSrc, nDst) = (src.count(), out.count())
    require(nSrc == nDst,
      s"sink compaction must be row-preserving: $sinkDir has $nSrc " +
        s"committed rows but compacted $dstPath reads $nDst")
    out
  }

  def compact(s: SparkSession, srcPath: String, dstPath: String,
              partCol: String, targetBytes: Long,
              hooks: Seq[StatsStore.PostRewriteHook] = Nil): DataFrame = {
    val plan = filePlan(s, srcPath, targetBytes)
    val src = s.read.option("mergeSchema", "true").parquet(srcPath)
    val dataCols = src.columns.filter(_ != partCol)
    import scala.jdk.CollectionConverters._
    val planDf = broadcast(s.createDataFrame(
      plan.toSeq.map { case (v, n) => org.apache.spark.sql.Row(v, n) }.asJava,
      org.apache.spark.sql.types.StructType(Seq(
        org.apache.spark.sql.types.StructField("_pv",
          org.apache.spark.sql.types.StringType, nullable = false),
        org.apache.spark.sql.types.StructField("_nf",
          org.apache.spark.sql.types.IntegerType, nullable = false)))))
    // EXPLICIT shuffle width = total planned files: one write task per
    // planned file (modulo hash collisions, which only merge). A bare
    // repartition(cols) lets AQE coalesce the tiny-data exchange to
    // one partition and write 1 file/directory regardless of the plan
    // (measured: the 4 KB-target spec case produced 83/83 files) — a
    // user-specified count pins the width. At extreme tree sizes
    // (≫10⁵ planned files) run compaction per subtree instead of
    // widening one shuffle indefinitely, as table formats do.
    val width = math.max(1, plan.values.sum)
    src
      .join(planDf,
        coalesce(col(partCol).cast("string"),
          lit(HiveDefaultPartition)) === col("_pv"))
      .withColumn("_slot",
        pmod(xxhash64(dataCols.map(col): _*), col("_nf").cast("long")))
      .repartition(width, col(partCol), col("_slot"))
      .drop("_pv", "_nf", "_slot")
      .write.mode(SaveMode.Overwrite).partitionBy(partCol).parquet(dstPath)
    val out = s.read.parquet(dstPath)
    val (nSrc, nDst) = (src.count(), out.count())
    require(nSrc == nDst,
      s"compaction must be row-preserving: source $srcPath has $nSrc " +
        s"rows but compacted $dstPath has $nDst — a partition value's " +
        s"hive encoding diverged from its cast-to-string rendering")
    // Directory-grain stats are INVARIANT under compaction (same rows,
    // same partitions), but FILE-grain stats are not (new files) —
    // a FileStatsHook here re-derives the per-file sidecar for the
    // compacted tree. Hooks see every partition value (compaction
    // rewrites the whole tree); null arrives as null, not the hive
    // sentinel, matching the rewrite's own join-side convention.
    if (hooks.nonEmpty) {
      val parts: Seq[Any] = plan.keys.toSeq
        .map(v => if (v == HiveDefaultPartition) null else v)
      hooks.foreach(_.afterRewrite(s, dstPath, partCol, parts))
    }
    out
  }
}
