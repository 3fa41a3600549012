package graft.sources

import org.apache.hadoop.fs.{FileSystem, Path}
import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}
import org.apache.spark.sql.functions._

/** A VERSIONED hive-partitioned table — the commit-log primitive that
  * unites the warehouse family's write half
  * ([[graft.operators.MergeInto.copyOnWrite]]: rewrite only touched
  * directories) with its read half
  * ([[graft.queries.CoreQueries.q56_time_travel]]: reconstruct AS OF a
  * point): every merge batch becomes a numbered COMMIT whose manifest
  * names the exact data files that are live at that version, data
  * files are append-only (a merge writes NEW files for the affected
  * directories and logically retires the old ones — never deletes),
  * and a reader serves any historical version by reading that
  * version's file list. This is the minimal form of what Delta's
  * `_delta_log` / Iceberg's snapshot manifests provide; the layout is
  * deliberately the same shape as the tree [[PartitionedWrite]]
  * produces, plus one `_graft_log/` directory of manifests.
  *
  * Layout:
  * {{{
  *   table/partCol=v/part-*.parquet      data files, APPEND-ONLY
  *   table/_graft_log/00000000.manifest  one relative file path per line
  *   table/_graft_log/00000001.manifest  ...
  * }}}
  *
  * Scale shape — why this is the 100 TB design and not a toy:
  *  - a commit lists and diffs ONLY the affected partition
  *    directories (the CDC batch's footprint), so commit cost is
  *    proportional to the changed slice, exactly like copy-on-write —
  *    the unaffected 99.9% of the corpus contributes untouched file
  *    ENTRIES carried forward in the manifest, not I/O;
  *  - a snapshot read is one manifest read (|live files| lines —
  *    metadata-scale) plus a parquet scan of exactly those files with
  *    `basePath` partition discovery, so partition pruning and column
  *    pruning work unchanged on historical versions;
  *  - old versions cost only the retained superseded files, and
  *    [[vacuum]] reclaims them by retention horizon — Delta's VACUUM.
  *
  * Single-writer contract: commits are serialized by the caller (a
  * production log store arbitrates with putIfAbsent; here the manifest
  * write refuses to clobber an existing version, so a lost race fails
  * loudly instead of corrupting the log). Partition values must
  * render stably through hive's directory encoding — the same
  * contract [[Compaction]] documents; the row-preservation assert in
  * [[commitMerge]] catches a divergence.
  */
object VersionedTable {

  private def fsFor(s: SparkSession, p: String): FileSystem =
    new Path(p).getFileSystem(s.sparkContext.hadoopConfiguration)

  private def logDir(tablePath: String): Path =
    new Path(tablePath, "_graft_log")

  private def manifestPath(tablePath: String, v: Long): Path =
    new Path(logDir(tablePath), f"$v%08d.manifest")

  private def isDataFile(p: Path): Boolean = {
    val n = p.getName
    !n.startsWith("_") && !n.startsWith(".")
  }

  /** Data files directly under `dir`, as paths relative to
    * `tablePath` — empty if the directory doesn't exist yet. */
  private def listDir(fs: FileSystem, tablePath: String,
                      dirName: String): Set[String] = {
    val d = new Path(tablePath, dirName)
    if (!fs.exists(d)) Set.empty
    else fs.listStatus(d).iterator
      .filter(f => f.isFile && isDataFile(f.getPath))
      .map(f => s"$dirName/${f.getPath.getName}").toSet
  }

  /** Versions present in the log, ascending; empty for a non-table. */
  def versions(s: SparkSession, tablePath: String): Seq[Long] = {
    val fs = fsFor(s, tablePath)
    val ld = logDir(tablePath)
    if (!fs.exists(ld)) Seq.empty
    else fs.listStatus(ld).iterator.map(_.getPath.getName)
      .filter(_.endsWith(".manifest"))
      .map(_.stripSuffix(".manifest").toLong).toSeq.sorted
  }

  /** Latest committed version; -1 for a non-table. */
  def currentVersion(s: SparkSession, tablePath: String): Long =
    versions(s, tablePath).lastOption.getOrElse(-1L)

  /** The live file list (relative paths) of version `v`. */
  def manifest(s: SparkSession, tablePath: String, v: Long): Seq[String] = {
    val fs = fsFor(s, tablePath)
    val in = fs.open(manifestPath(tablePath, v))
    try scala.io.Source.fromInputStream(in, "UTF-8")
      .getLines().filter(_.nonEmpty).toVector
    finally in.close()
  }

  /** Atomic, non-clobbering manifest write: tmp file + rename, and the
    * rename refuses an existing target — a racing second writer of the
    * same version fails instead of splitting history. */
  private[sources] def writeManifest(fs: FileSystem, tablePath: String,
                                     v: Long, files: Seq[String]): Unit = {
    val dst = manifestPath(tablePath, v)
    require(!fs.exists(dst), s"version $v already committed at $dst")
    fs.mkdirs(logDir(tablePath))
    val tmp = new Path(logDir(tablePath), s".${dst.getName}.tmp")
    val out = fs.create(tmp, true)
    try out.write((files.sorted.mkString("\n") + "\n").getBytes("UTF-8"))
    finally out.close()
    require(fs.rename(tmp, dst),
      s"manifest commit lost the rename race for version $v at $dst")
  }

  /** Create the table: write `df` (which must carry `partCol`) as the
    * hive-partitioned tree at `tablePath` and commit it as version 0.
    * Rebuild-on-miss like every [[Layouts]] artifact: an existing tree
    * (and its log) is replaced wholesale. Returns the v0 relation. */
  def init(s: SparkSession, tablePath: String, df: DataFrame,
           partCol: String): DataFrame = {
    val fs = fsFor(s, tablePath)
    fs.delete(new Path(tablePath), true)
    df.write.mode(SaveMode.Overwrite).partitionBy(partCol).parquet(tablePath)
    val dirs = fs.listStatus(new Path(tablePath)).iterator
      .filter(d => d.isDirectory && d.getPath.getName.contains("="))
      .map(_.getPath.getName).toSeq
    writeManifest(fs, tablePath, 0L,
      dirs.flatMap(listDir(fs, tablePath, _)))
    snapshot(s, tablePath, 0L)
  }

  /** Read the table AS OF `version` (default: latest): the manifest's
    * exact file list with `basePath` partition discovery, so the
    * partition column and its pruning work on historical versions
    * exactly as on a plain tree. */
  def snapshot(s: SparkSession, tablePath: String,
               version: Long = -1L): DataFrame = {
    val v = if (version < 0) currentVersion(s, tablePath) else version
    val files = manifest(s, tablePath, v)
    require(files.nonEmpty, s"version $v of $tablePath has no live files")
    s.read.option("basePath", tablePath)
      .parquet(files.map(f => s"$tablePath/$f"): _*)
  }

  /** The INDEX-backed read ([[VersionedFileIndex]]): same relation as
    * [[snapshot]], but through a Catalyst `FileIndex` whose listing
    * is the manifest — partition pruning evaluates inside the index
    * on historical versions, and wiring a q54-style sidecar
    * (`statsPath` + data column → (min,max) sidecar column names)
    * makes zone-map data skipping automatic for ANY query over the
    * relation. The table-format integration shape (Delta's
    * TahoeFileIndex); [[snapshot]] stays as the dependency-free file-
    * list form. */
  def snapshotRelation(s: SparkSession, tablePath: String, partCol: String,
                       version: Long = -1L,
                       statsPath: Option[String] = None,
                       statsCols: Map[String, (String, String)] = Map.empty)
      : DataFrame =
    VersionedFileIndex.relation(s, tablePath, partCol, version,
      statsPath, statsCols)

  /** Apply a CDC changeset (same contract as
    * [[graft.operators.MergeInto]]: key + op 'U'|'D'|'I' + payload
    * incl. `partCol`) as a new COMMIT, and return its version.
    *
    * The merge itself is [[graft.operators.MergeInto.apply]] over the
    * current snapshot FILTERED to the affected partitions — the
    * copy-on-write decomposition — but the write is `Append`: the
    * affected directories gain fresh files holding their merged state
    * while their old files stay on disk for history, and the new
    * manifest = (previous manifest minus every file in an affected
    * directory) + the appended files. A partition whose rows were all
    * deleted simply contributes no new files — no directory delete to
    * get right, the manifest just stops listing it (contrast the
    * resurrect-on-full-delete trap copyOnWrite must handle).
    *
    * `partitionKeyImmutable` is the same production fast path as
    * copyOnWrite's: affected partitions from the changeset alone, no
    * snapshot probe — and the same documented stale-survivor hazard
    * if the caller breaks the contract. */
  def commitMerge(s: SparkSession, tablePath: String, partCol: String,
                  changes: DataFrame, key: String,
                  partitionKeyImmutable: Boolean = false,
                  hooks: Seq[StatsStore.PostRewriteHook] = Nil): Long = {
    val fs = fsFor(s, tablePath)
    val v = currentVersion(s, tablePath)
    require(v >= 0, s"$tablePath is not a versioned table (no log)")
    val prev = manifest(s, tablePath, v)
    val snap = snapshot(s, tablePath, v)
    val touched = broadcast(
      changes.filter(col("op").isin("U", "D")).select(col(key)))
    val arriving = changes.filter(col("op").isin("U", "I")).drop("op")
    // cast to the snapshot's partition type — the boxed-equality
    // hazard documented at MergeInto.copyOnWrite
    val partType = snap.schema(partCol).dataType
    val parts = (if (partitionKeyImmutable)
        changes.select(col(partCol).cast(partType))
      else snap.join(touched, Seq(key), "left_semi")
        .select(col(partCol))
        .union(arriving.select(col(partCol).cast(partType))))
      .distinct().collect().map(_.get(0)).toSeq
    if (parts.isEmpty) return v // empty changeset: no new version
    val (nullPart, defined) = parts.partition(_ == null)
    val inAffected = (
      (if (defined.nonEmpty) Seq(col(partCol).isInCollection(defined))
       else Nil) ++
      (if (nullPart.nonEmpty) Seq(col(partCol).isNull) else Nil)
    ).reduce(_ || _)
    val affectedDirs = parts.map { pv =>
      val dirName = if (pv == null) "__HIVE_DEFAULT_PARTITION__"
      else org.apache.spark.sql.catalyst.catalog.ExternalCatalogUtils
        .escapePathName(String.valueOf(pv))
      s"$partCol=$dirName"
    }
    val before = affectedDirs.flatMap(listDir(fs, tablePath, _)).toSet
    val merged = graft.operators.MergeInto(snap.filter(inAffected),
      changes, key)
    // Append never deletes, and the snapshot scan's file list was
    // resolved at planning, so writing into the directories being read
    // is safe — no localCheckpoint needed (copyOnWrite pays one only
    // because dynamic OVERWRITE deletes the files it reads).
    merged.select(snap.columns.map(col): _*)
      .write.mode(SaveMode.Append).partitionBy(partCol).parquet(tablePath)
    val newFiles = affectedDirs.flatMap(listDir(fs, tablePath, _))
      .toSet -- before
    val survivors = prev.filterNot(f =>
      affectedDirs.exists(d => f.startsWith(d + "/")))
    // A maintenance verb must refuse to lose rows: the new version
    // must hold exactly the merged state of the affected slice plus
    // the untouched survivors. Cheap footer-count audit, same
    // rationale as Compaction's.
    val expected = merged.count()
    val got = s.read.option("basePath", tablePath)
      .parquet(newFiles.toSeq.sorted.map(f => s"$tablePath/$f"): _*).count()
    require(expected == got,
      s"commit $v+1 on $tablePath: merged slice has $expected rows but " +
        s"the appended files hold $got — partition rendering diverged")
    writeManifest(fs, tablePath, v + 1, survivors ++ newFiles)
    // Post-commit maintenance, the copyOnWrite hook contract — but
    // note a plain StatsStore.DirStatsHook is WRONG on a versioned
    // table (a directory read would also aggregate the retired
    // history files still on disk); pass [[statsHook]], which reads
    // through the new version's manifest.
    hooks.foreach(_.afterRewrite(s, tablePath, partCol, parts))
    v + 1
  }

  /** A [[StatsStore.PostRewriteHook]] that is correct on a VERSIONED
    * table: the refresh must aggregate the LIVE file set of the
    * latest version (a plain directory read would also count the
    * retired history files still on disk). Splices like
    * [[StatsStore.refreshDirStats]], reading through [[snapshot]]. */
  def statsHook(statsPath: String, cols: Seq[StatsStore.ColSpec],
                ndv: Option[StatsStore.NdvSpec] = None)
      : StatsStore.PostRewriteHook = new StatsStore.PostRewriteHook {
    def afterRewrite(s: SparkSession, treePath: String, partCol: String,
                     rewrittenParts: Seq[Any]): Unit = {
      if (rewrittenParts.isEmpty) return
      val snap = snapshot(s, treePath)
      val (nullPart, defined) = rewrittenParts.partition(_ == null)
      val pred = (
        (if (defined.nonEmpty) Seq(col(partCol).isInCollection(defined))
         else Nil) ++
        (if (nullPart.nonEmpty) Seq(col(partCol).isNull) else Nil)
      ).reduce(_ || _)
      StatsStore.spliceDirStats(s, statsPath, partCol, rewrittenParts,
        StatsStore.dirStats(snap.filter(pred), partCol, cols, ndv))
    }
  }

  /** OPTIMIZE as a commit — [[Compaction]]'s verb inside the version
    * log: rewrite the CURRENT version's live files into
    * ceil(bytes/target) per directory and commit the result as a new
    * version with the IDENTICAL relation. Because the write is
    * append-only like every commit, time travel across an optimize
    * is free: version N-1 still reads the small files, version N the
    * compacted ones, and [[vacuum]] reclaims the former when the
    * retention horizon passes — exactly Delta's OPTIMIZE +
    * VACUUM lifecycle. Returns the new version. */
  def commitOptimize(s: SparkSession, tablePath: String, partCol: String,
                     targetBytes: Long): Long = {
    val fs = fsFor(s, tablePath)
    val v = currentVersion(s, tablePath)
    require(v >= 0, s"$tablePath is not a versioned table (no log)")
    val live = manifest(s, tablePath, v)
    // per-directory byte totals from the LIVE set only (metadata-
    // scale), the filePlan shape with retired files excluded
    val dirBytes = live.groupBy(_.split("/")(0)).map { case (d, fsn) =>
      d -> fsn.map(f => fs.getFileStatus(new Path(tablePath, f)).getLen).sum
    }
    val plan = dirBytes.map { case (d, b) =>
      d -> math.max(1L, (b + targetBytes - 1) / targetBytes).toInt }
    val snap = snapshot(s, tablePath, v)
    val dataCols = snap.columns.filter(_ != partCol)
    import scala.jdk.CollectionConverters._
    // plan keys are manifest dir names (hive-ESCAPED); the join side
    // compares against the data column's cast-to-string rendering, so
    // unescape like Compaction.filePlan (null sentinel stays literal)
    val planDf = broadcast(s.createDataFrame(
      plan.toSeq.map { case (d, nf) =>
        val pv = d.split("=", 2)(1)
        val un = if (pv == "__HIVE_DEFAULT_PARTITION__") pv
          else org.apache.spark.sql.catalyst.catalog.ExternalCatalogUtils
            .unescapePathName(pv)
        org.apache.spark.sql.Row(un, nf) }.asJava,
      org.apache.spark.sql.types.StructType(Seq(
        org.apache.spark.sql.types.StructField("_pv",
          org.apache.spark.sql.types.StringType, nullable = false),
        org.apache.spark.sql.types.StructField("_nf",
          org.apache.spark.sql.types.IntegerType, nullable = false)))))
    val width = math.max(1, plan.values.sum)
    val affectedDirs = plan.keys.toSeq
    val before = affectedDirs.flatMap(listDir(fs, tablePath, _)).toSet
    snap
      .join(planDf,
        coalesce(col(partCol).cast("string"),
          lit("__HIVE_DEFAULT_PARTITION__")) === col("_pv"))
      .withColumn("_slot",
        pmod(xxhash64(dataCols.map(col): _*), col("_nf").cast("long")))
      .repartition(width, col(partCol), col("_slot"))
      .drop("_pv", "_nf", "_slot")
      .write.mode(SaveMode.Append).partitionBy(partCol).parquet(tablePath)
    val newFiles = affectedDirs.flatMap(listDir(fs, tablePath, _))
      .toSet -- before
    val expected = snap.count()
    val got = s.read.option("basePath", tablePath)
      .parquet(newFiles.toSeq.sorted.map(f => s"$tablePath/$f"): _*).count()
    require(expected == got,
      s"optimize on $tablePath must be row-preserving: live $expected " +
        s"rows but rewrote $got")
    writeManifest(fs, tablePath, v + 1, newFiles.toSeq)
    v + 1
  }

  /** Reclaim history older than `keepFrom`: delete every manifest with
    * version < keepFrom and every data file referenced ONLY by those
    * manifests. Snapshots ≥ keepFrom are untouched (their shared files
    * are retained). Returns the deleted data-file paths (relative).
    * The one verb that is inherently O(|physical files|): it must
    * sweep the tree for orphans — production runs it on the same
    * retention cadence Delta's VACUUM does. */
  def vacuum(s: SparkSession, tablePath: String,
             keepFrom: Long): Seq[String] = {
    val fs = fsFor(s, tablePath)
    val all = versions(s, tablePath)
    val (drop, keep) = all.partition(_ < keepFrom)
    require(keep.nonEmpty, s"vacuum would delete every version of " +
      s"$tablePath (keepFrom=$keepFrom, latest=${all.lastOption.orNull})")
    val live = keep.flatMap(manifest(s, tablePath, _)).toSet
    val dirs = fs.listStatus(new Path(tablePath)).iterator
      .filter(d => d.isDirectory && d.getPath.getName.contains("="))
      .map(_.getPath.getName).toSeq
    val orphans = dirs.flatMap(listDir(fs, tablePath, _))
      .filterNot(live).sorted
    orphans.foreach(f => fs.delete(new Path(tablePath, f), false))
    // drop now-empty partition directories so the tree stays listable
    dirs.foreach { d =>
      val p = new Path(tablePath, d)
      if (fs.listStatus(p).isEmpty) fs.delete(p, false)
    }
    drop.foreach(v => fs.delete(manifestPath(tablePath, v), false))
    orphans
  }
}
