package graft

import java.util.concurrent.atomic.AtomicLong

import org.apache.spark.scheduler.{SparkListener, SparkListenerTaskEnd}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** A/B harness for the engine's custom-plan operators: each duel runs
  * the custom operator and its stock-Spark twin on the SAME input and
  * reports wall time plus total shuffle records/bytes written (task
  * metrics via listener) — the two numbers the custom tiers exist to
  * move. Prints one JSON line per duel.
  *
  *  - `topk`: [[graft.plans.GroupedTopK]] (partial heaps → ≤k rows per
  *    group per partition on the exchange → final heaps) vs the
  *    `row_number().over(window) <= k` plan (full sort of every
  *    partition on both sides of the exchange).
  *  - `bitmap`: [[graft.functions.BitmapDistinct]] (one OR-merged
  *    bitmap buffer per group on the exchange) vs `count_distinct`
  *    (first phase keyed on (group, value) — a shuffled row per
  *    distinct pair per partition).
  *  - `band`: `q38`'s pure band join with
  *    [[graft.plans.RangeJoinBinning]] on (Expand-to-2-bins equi-join)
  *    vs off (stock BroadcastNestedLoopJoin). The rule-off side is
  *    O(n·m): ~2·10^8 predicate evaluations at sf0.01, ~2·10^10 at
  *    sf0.1 — size the SF (and `SPARK_GRAFT_NSAMPLES=1`) accordingly.
  *    Below the crossover (sf0.01) the nested loop WINS — binning
  *    pays two exchanges and an Expand; the duel exists to locate
  *    that crossover honestly, not to flatter the rule.
  *
  * Methodology matches Bench: median of 3 samples (override with
  * `SPARK_GRAFT_NSAMPLES`), materialization via
  * `queryExecution.toRdd.count()` so count()-side re-optimization
  * can't prune either contender's plan, `SPARK_GRAFT_SF_DIR` selects
  * the data (default sf0.1).
  */
object Duel {

  private final class ShuffleTally extends SparkListener {
    val records = new AtomicLong(0L)
    val bytes = new AtomicLong(0L)
    val inputRecords = new AtomicLong(0L)
    val inputBytes = new AtomicLong(0L)
    override def onTaskEnd(e: SparkListenerTaskEnd): Unit = {
      val m = e.taskMetrics
      if (m != null) {
        records.addAndGet(m.shuffleWriteMetrics.recordsWritten)
        bytes.addAndGet(m.shuffleWriteMetrics.bytesWritten)
        inputRecords.addAndGet(m.inputMetrics.recordsRead)
        inputBytes.addAndGet(m.inputMetrics.bytesRead)
      }
    }
  }

  /** (median seconds, shuffle records, shuffle bytes) of `n` runs.
    * Each sample keeps ITS OWN tally and the reported records/bytes
    * are the median-time sample's — the same run the reported seconds
    * come from (for these fixed-plan duels the tallies are identical
    * every run anyway, but this keeps one convention across the file
    * with `measureCc`/`measurePr`, whose converged-loop traffic can
    * shift between samples).
    */
  private def measure(spark: SparkSession, df: => DataFrame, n: Int)
      : (Double, Long, Long) = {
    val samples = (1 to n).map { _ =>
      val tally = new ShuffleTally
      spark.sparkContext.addSparkListener(tally)
      val t0 = System.nanoTime()
      df.queryExecution.toRdd.count()
      val sec = (System.nanoTime() - t0) / 1e9
      // task-end events are posted async; drain before reading
      org.apache.spark.sql.graft.ColumnBridge.drainListenerBus(spark.sparkContext)
      spark.sparkContext.removeSparkListener(tally)
      (sec, tally.records.get(), tally.bytes.get())
    }
    samples.sortBy(_._1).apply(samples.length / 2)
  }

  /** (median seconds, input records read) of `n` runs — the scan-cost
    * twin of [[measure]] for layout duels (z-order, partition
    * pruning), where the number that scales is what the reader
    * DECODED, not what the shuffle moved. Median-sample convention,
    * same as `measure`.
    */
  private def measureScan(spark: SparkSession, df: => DataFrame, n: Int)
      : (Double, Long) = {
    val samples = (1 to n).map { _ =>
      val tally = new ShuffleTally
      spark.sparkContext.addSparkListener(tally)
      val t0 = System.nanoTime()
      df.queryExecution.toRdd.count()
      val sec = (System.nanoTime() - t0) / 1e9
      org.apache.spark.sql.graft.ColumnBridge
        .drainListenerBus(spark.sparkContext)
      spark.sparkContext.removeSparkListener(tally)
      (sec, tally.inputRecords.get())
    }
    samples.sortBy(_._1).apply(samples.length / 2)
  }

  /** (median seconds, input records, input BYTES) — for duels where
    * record tallies hide the cost (a record-level reader filter
    * excludes non-matching rows from recordsRead even when their
    * pages were fetched and decompressed); bytesRead still counts the
    * fetched file bytes.
    */
  private def measureScanIO(spark: SparkSession, df: => DataFrame, n: Int)
      : (Double, Long, Long) = {
    val samples = (1 to n).map { _ =>
      val tally = new ShuffleTally
      spark.sparkContext.addSparkListener(tally)
      val t0 = System.nanoTime()
      df.queryExecution.toRdd.count()
      val sec = (System.nanoTime() - t0) / 1e9
      org.apache.spark.sql.graft.ColumnBridge
        .drainListenerBus(spark.sparkContext)
      spark.sparkContext.removeSparkListener(tally)
      (sec, tally.inputRecords.get(), tally.inputBytes.get())
    }
    samples.sortBy(_._1).apply(samples.length / 2)
  }

  private def report(name: String, custom: (Double, Long, Long),
      stock: (Double, Long, Long), sf: String): Unit = {
    val (ct, cr, cb) = custom
    val (st, sr, sb) = stock
    println(f"""{"duel":"$name","sf":"$sf","custom_sec":$ct%.3f,"stock_sec":$st%.3f,"speedup":${st / ct}%.2f,"custom_shuffle_rows":$cr,"stock_shuffle_rows":$sr,"custom_shuffle_bytes":$cb,"stock_shuffle_bytes":$sb}""")
  }

  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val n = sys.env.getOrElse("SPARK_GRAFT_NSAMPLES", "3").toInt
    val which = if (args.nonEmpty) args.toSet
      else Set("topk", "bitmap", "band", "hist", "zorder", "bucketedsym",
        "bucketededges", "hits", "dpp", "bloom", "compaction", "mergecow",
        "statsskip", "fileskip", "vtzorder", "bloomskip")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      // match the Bench/Verify runtime posture (see the Bench note)
      .config("spark.sql.optimizer.canChangeCachedPlanOutputPartitioning",
        "true")
      // bytes-derived scan splits, same as Bench (see the note there)
      .config("spark.sql.files.minPartitionNum", "1")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.sql.extensions", "graft.functions.GraftExtensions")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    spark.range(1000000).selectExpr("sum(id)").collect() // JIT/executor warmup

    if (which("topk")) {
      def src = Tables(spark, sfDir, "lineitem")
        .select(col("l_suppkey"), col("l_orderkey"), col("l_extendedprice"))
      val custom = measure(spark, graft.plans.GroupedTopK.of(src,
        Seq("l_suppkey"), Seq(("l_extendedprice", false), ("l_orderkey", true)),
        3), n)
      val w = Window.partitionBy(col("l_suppkey"))
        .orderBy(col("l_extendedprice").desc, col("l_orderkey").asc)
      val stock = measure(spark, src.withColumn("rn", row_number().over(w))
        .filter(col("rn") <= 3).drop("rn"), n)
      report("topk_heap_vs_window", custom, stock, sfDir)
    }

    if (which("bitmap")) {
      // Domain-BOUNDED case: distinct custkeys per priority. The pair
      // shuffle is capped by the (fixed) custkey domain, so wall time
      // converges as data grows and the bitmap's win is shuffle volume.
      def src = Tables(spark, sfDir, "orders")
      val custom = measure(spark, src.groupBy(col("o_orderpriority"))
        .agg(graft.functions.BitmapDistinct.of(col("o_custkey")).as("n")), n)
      val stock = measure(spark, src.groupBy(col("o_orderpriority"))
        .agg(countDistinct(col("o_custkey")).as("n")), n)
      report("bitmap_vs_count_distinct", custom, stock, sfDir)
      // Domain-GROWING case: distinct orderkeys per returnflag. Here
      // the distinct-pair cardinality grows WITH the data (the 100 TB
      // shape), while the bitmap buffer grows only with the id span.
      def li = Tables(spark, sfDir, "lineitem")
      val custom2 = measure(spark, li.groupBy(col("l_returnflag"))
        .agg(graft.functions.BitmapDistinct.of(col("l_orderkey")).as("n")), n)
      val stock2 = measure(spark, li.groupBy(col("l_returnflag"))
        .agg(countDistinct(col("l_orderkey")).as("n")), n)
      report("bitmap_vs_count_distinct_growing", custom2, stock2, sfDir)
    }

    if (which("zorder")) {
      // Layout duel for the ZOrder expression: the SAME lineitem rows
      // written two ways — z-clustered (range-partitioned + sorted by
      // the Morton value) vs 1-D-sorted by l_partkey — then probed
      // with a 2-D box predicate selective on BOTH dims (1/64 of the
      // key plane). Parquet row-group stats prune by min/max: the 1-D
      // layout can only prune on its sort dimension (~1/8 of the rows
      // survive pruning; the suppkey constraint prunes nothing), while
      // z-clustered files are aligned tiles tight in BOTH dims, so
      // pruning approaches the box's 1/64 area. `scan_rows` is
      // inputMetrics.recordsRead — the rows the reader actually
      // decoded after row-group pruning, the number a 100 TB scan
      // pays for.
      val li = Tables(spark, sfDir, "lineitem")
        .select(col("l_orderkey"), col("l_partkey"), col("l_suppkey"),
          col("l_extendedprice"))
      val (pMax, sMax) = {
        val r = li.agg(max(col("l_partkey")), max(col("l_suppkey"))).head()
        (r.getLong(0), r.getLong(1))
      }
      val zdir = "target/duel_zorder/z"
      val ldir = "target/duel_zorder/linear"
      val nFiles = 256
      // The z side is the first-class operator (normalization — the
      // "z-order needs bit-balanced dims" rule — lives inside it).
      graft.sources.ZOrderedWrite.write(spark, li,
        "l_partkey", "l_suppkey", nFiles, zdir)
      li.repartitionByRange(nFiles, col("l_partkey"))
        .sortWithinPartitions(col("l_partkey"))
        .write.mode("overwrite").parquet(ldir)
      def agg(df: org.apache.spark.sql.DataFrame) =
        df.agg(sum(col("l_extendedprice")).as("rev"), count(lit(1)).as("n"))
      // the 2-D box (1/64 of the key plane) and the second-dim-only
      // band (1/8) — the latter is where a 1-D layout prunes NOTHING
      def box(dir: String) = agg(spark.read.parquet(dir)
        .filter(col("l_partkey").between(pMax / 2, pMax / 2 + pMax / 8) &&
          col("l_suppkey").between(sMax / 2, sMax / 2 + sMax / 8)))
      def band(dir: String) = agg(spark.read.parquet(dir)
        .filter(col("l_suppkey").between(sMax / 2, sMax / 2 + sMax / 8)))
      for ((tag, probe) <- Seq("box2d" -> (box _), "dim2band" -> (band _))) {
        val (zs, zr) = measureScan(spark, probe(zdir), n)
        val (ls, lr) = measureScan(spark, probe(ldir), n)
        println(f"""{"duel":"zorder_$tag","sf":"$sfDir","z_sec":$zs%.3f,"linear_sec":$ls%.3f,"z_scan_rows":$zr,"linear_scan_rows":$lr,"prune_ratio":${lr.toDouble / math.max(zr, 1L)}%.2f}""")
      }
    }

    if (which("vtzorder")) {
      // OPTIMIZE ZORDER duel (q63's machinery): the SAME versioned
      // table probed AS-OF v0 (the ingest layout — files hold rows in
      // arrival order, so every file spans the whole key plane and
      // parquet row-group stats prune nothing) vs AS-OF v1 (the
      // OPTIMIZE ZORDER commit — files are near-square z-tiles) under
      // a 2-D box selective on both dims and a dim-2-only band.
      // `scan_rows` is what the reader decoded after row-group
      // pruning; `scan_bytes` the fetched file bytes — the numbers a
      // 100 TB scan pays. Time travel makes the duel exact: identical
      // rows, identical manifest machinery, only the layout differs.
      val root = "target/duel_vtzorder/table"
      val li = Tables(spark, sfDir, "lineitem")
        .select(col("l_orderkey"), col("l_partkey"), col("l_suppkey"),
          col("l_extendedprice"), year(col("l_shipdate")).as("l_year"))
      val (pMax, sMax) = {
        val r = li.agg(max(col("l_partkey")), max(col("l_suppkey"))).head()
        (r.getLong(0), r.getLong(1))
      }
      graft.sources.VersionedTable.init(spark, root, li, "l_year")
      // 32 z-tiles per year directory — the STRUCTURAL number here is
      // rows_ratio (tiling-vs-box geometry: measured 4.7× on the box,
      // 2.2× on the band at sf0.1; it RISES with tile count because
      // local-SF files hold a single row group, so pruning granularity
      // = file). bytes_ratio at demo scale runs BELOW 1 — hundreds of
      // tiny files pay a footer/dictionary tax that dwarfs a 1.5 MB
      // corpus — and is NOT the 100 TB story: there the dial is
      // row-group multiples per file (commitOptimizeZOrder's scaladoc)
      // and per-file overhead is noise against the pruned gigabytes.
      // Swept 8/16/32 per dir: rows_ratio 1.5/2.6/4.7, bytes_ratio
      // 0.54/0.50/0.76 — the trade is explicit, not hidden.
      graft.sources.VersionedTable.commitOptimizeZOrder(spark, root,
        "l_year", "l_partkey", "l_suppkey", filesPerDir = 32)
      def agg(df: org.apache.spark.sql.DataFrame) =
        df.agg(sum(col("l_extendedprice")).as("rev"), count(lit(1)).as("n"))
      def box(v: Long) = agg(graft.sources.VersionedTable
        .snapshotRelation(spark, root, "l_year", v)
        .filter(col("l_partkey").between(pMax / 2, pMax / 2 + pMax / 8) &&
          col("l_suppkey").between(sMax / 2, sMax / 2 + sMax / 8)))
      def band(v: Long) = agg(graft.sources.VersionedTable
        .snapshotRelation(spark, root, "l_year", v)
        .filter(col("l_suppkey").between(sMax / 2, sMax / 2 + sMax / 8)))
      for ((tag, probe) <- Seq("box2d" -> (box _), "dim2band" -> (band _))) {
        val (zs, zr, zb) = measureScanIO(spark, probe(1L), n)
        val (ps, pr, pb) = measureScanIO(spark, probe(0L), n)
        println(f"""{"duel":"vtzorder_$tag","sf":"$sfDir","optimized_sec":$zs%.3f,"ingest_sec":$ps%.3f,"optimized_scan_rows":$zr,"ingest_scan_rows":$pr,"optimized_scan_bytes":$zb,"ingest_scan_bytes":$pb,"rows_ratio":${pr.toDouble / math.max(zr, 1L)}%.2f,"bytes_ratio":${pb.toDouble / math.max(zb, 1L)}%.2f}""")
      }
    }

    if (which("dpp")) {
      // Layout duel for dynamic partition pruning: q48's star-join
      // shape over the month-partitioned lineitem, identical plan
      // modulo the DPP subquery. With pruning OFF the fact scan
      // decodes every month directory and the join discards ~90% of
      // the rows AFTER the read; with pruning ON the runtime
      // dim-filter skips the non-matching directories at the file
      // index, so `scan_rows` collapses toward the workload's months
      // (≤8 of 83). At local SF wall time is mostly fixed cost —
      // `prune_ratio` (rows decoded, off/on) is the number that
      // carries to 100 TB, where the scan IS the query's cost.
      val pdir = "target/duel_part_li_" +
        graft.sources.Bucketing.pathDigest(sfDir)
      // within-partition split sized to the machine (the q48 layout's
      // rule: a ≤8-directory pruned scan must still engage every core)
      graft.sources.PartitionedWrite.partitionedTable(spark,
        Tables(spark, sfDir, "lineitem"), pdir, "l_smonth",
        year(col("l_shipdate")) * 100 + month(col("l_shipdate")),
        splitFiles =
          math.max(1, spark.sparkContext.defaultParallelism / 8))
      def dim = broadcast(Tables(spark, sfDir, "orders")
        .filter(col("o_orderpriority") === "1-URGENT" &&
          col("o_orderdate") >= lit("2001-01-01").cast("timestamp"))
        .select((year(col("o_orderdate")) * 100 +
          month(col("o_orderdate"))).as("m"))
        .distinct())
      def q = spark.read.parquet(pdir)
        .join(dim, col("l_smonth") === col("m"))
        .groupBy(col("l_smonth"))
        .agg(sum(col("l_extendedprice")).as("rev"), count(lit(1)).as("n"))
      val dppKey = "spark.sql.optimizer.dynamicPartitionPruning.enabled"
      val prevDpp = spark.conf.get(dppKey)
      // pin DPP ON for the ON leg (a session that previously disabled
      // it would otherwise measure off-vs-off and the assert below
      // would fail spuriously)
      spark.conf.set(dppKey, "true")
      val (ons, onr) = measureScan(spark, q, n)
      // both plans scan the dim exactly once — ON-side the DPP
      // subquery REUSES the join's broadcast; assert that reuse WHILE
      // DPP is still on, and on ONE BOUND instance: `q` is a def, so
      // collecting one instance and reading another's queryExecution
      // would inspect an unexecuted plan, where AQE has not yet
      // substituted ReusedSubquery/ReusedExchange (the vacuous-assert
      // trap). If reuse ever failed the dim would be scanned twice and
      // the fact-row subtraction below would be skewed with no signal.
      val qq = q
      qq.collect()
      val onPlan = qq.queryExecution.executedPlan.toString
      assert(onPlan.contains("dynamicpruningexpression"),
        "dpp duel: no dynamic pruning subquery on the fact scan")
      assert(!onPlan.contains("SubqueryExec") ||
        onPlan.contains("ReusedSubquery") || onPlan.contains("ReusedExchange"),
        "dpp duel: DPP subquery did not reuse the join's broadcast — " +
          "dim scanned twice, fact-row subtraction would be skewed")
      spark.conf.set(dppKey, "false")
      val (offs, offr) = measureScan(spark, q, n)
      spark.conf.set(dppKey, prevDpp)
      // subtracting the (single) dim scan's rows isolates the
      // FACT-side prune — the number that scales with the corpus
      val (_, dimRows) = measureScan(spark, dim, 1)
      val (onFact, offFact) = (onr - dimRows, offr - dimRows)
      println(f"""{"duel":"dpp_star_join","sf":"$sfDir","dpp_sec":$ons%.3f,"no_dpp_sec":$offs%.3f,"dpp_fact_rows":$onFact,"no_dpp_fact_rows":$offFact,"prune_ratio":${offFact.toDouble / math.max(onFact, 1L)}%.2f}""")
    }

    if (which("compaction")) {
      // Layout-MAINTENANCE duel: the same full-scan aggregation over
      // q51's over-split tree vs its compacted rewrite — identical
      // rows decoded (scan_rows asserts it below), so the wall delta
      // is pure per-file cost: opens, footer reads, row-group boots,
      // task scheduling. The file counts are the numbers that carry to
      // 100 TB: a streaming sink accumulating 100× more commits pays
      // 100× more opens while the compacted twin's count stays pinned
      // to ceil(bytes/target); wall at local SF mostly measures the
      // fixed costs the files multiply.
      val digest = graft.sources.Bucketing.pathDigest(sfDir)
      val frag = graft.sources.Layouts.root(spark) + "/frag_li_" + digest
      val comp = graft.sources.Layouts.root(spark) + "/compact_li_" + digest
      graft.sources.PartitionedWrite.partitionedTable(spark,
        Tables(spark, sfDir, "lineitem"), frag, "l_smonth",
        year(col("l_shipdate")) * 100 + month(col("l_shipdate")),
        splitFiles = math.max(8, spark.sparkContext.defaultParallelism))
      graft.sources.Compaction.compact(spark, frag, comp, "l_smonth",
        128L * 1024 * 1024)
      def probe(path: String) = spark.read.parquet(path)
        .groupBy(col("l_returnflag"))
        .agg(sum(col("l_extendedprice")).as("rev"), count(lit(1)).as("n"))
      val nf = graft.sources.Compaction.fileCounts(spark, frag).values.sum
      val nc = graft.sources.Compaction.fileCounts(spark, comp).values.sum
      val (fsec, frows) = measureScan(spark, probe(frag), n)
      val (csec, crows) = measureScan(spark, probe(comp), n)
      assert(frows == crows,
        s"compaction duel decoded different row counts: $frows vs $crows")
      println(f"""{"duel":"compaction","sf":"$sfDir","frag_files":$nf,"compact_files":$nc,"frag_sec":$fsec%.3f,"compact_sec":$csec%.3f,"speedup":${fsec / csec}%.2f,"scan_rows":$frows}""")
    }

    if (which("statsskip")) {
      // Zone-map duel: q55's stats-driven directory skip vs the same
      // date-window aggregation over the full tree (the engine's own
      // plan for a data-column predicate — all directories listed,
      // the predicate only prunes inside the scan). Rows decoded is
      // the carrying number: the skip reads the window's months, the
      // engine reads the corpus. Identical results asserted by the
      // oracle (q55's hash); here the two legs' aggregates are
      // compared directly.
      // defs, not vals: a reused DataFrame lets samples 2-3 serve the
      // agg from the first run's shuffle files (skipped map stages,
      // 0 rows decoded) — each sample must re-plan to re-scan
      def q55 = graft.queries.CoreQueries.q55_stats_skipping(spark, sfDir)
      def full = graft.queries.CoreQueries
        .partitionedLineitemForSpec(spark, sfDir)
        .filter(col("l_shipdate") >= to_timestamp(lit("1997-03-10")) &&
          col("l_shipdate") <= to_timestamp(lit("1997-06-20")))
        .groupBy(col("l_returnflag"))
        .agg(sum(col("l_extendedprice").cast("decimal(28,2)"))
          .cast("double").as("rev"), count(lit(1)).as("n_rows"))
      val (skipSec, skipRows) = measureScan(spark, q55, n)
      val (fullSec, fullRows) = measureScan(spark, full, n)
      def res(df: DataFrame) = df.collect().map(_.toSeq.toString).sorted.toSeq
      assert(res(q55) == res(full), "statsskip duel: relations diverge")
      println(f"""{"duel":"statsskip","sf":"$sfDir","skip_rows_decoded":$skipRows,"full_rows_decoded":$fullRows,"rows_ratio":${fullRows.toDouble / math.max(1L, skipRows)}%.1f,"skip_sec":$skipSec%.3f,"full_sec":$fullSec%.3f,"speedup":${fullSec / skipSec}%.2f}""")
    }

    if (which("fileskip")) {
      // File-grain zone-map duel, three legs telling the layered
      // story of q58's intra-month window on a multi-file tree:
      //  1. HASH-split directory (q51's frag layout), dir-grain skip:
      //     every file spans the whole month, so neither parquet
      //     row-group stats nor any file sidecar can prune within it —
      //     the whole month decodes.
      //  2. RANGE-clustered directory (q58's tree), dir-grain skip:
      //     files tile the month by date, so parquet's OWN row-group
      //     min/max prunes decode down to the qualifying rows — but
      //     only after LISTING and OPENING every file of the month
      //     (a footer read per file: the scan-time metadata cost).
      //  3. Same tree, q58's file-grain sidecar: same decode, but the
      //     non-qualifying files are pruned at PLAN time — never
      //     listed, never opened. files_listed is the number that
      //     carries to object storage, where per-file opens dominate
      //     an intra-month query's cost at 100k files/table.
      // Identical relations asserted; defs not vals (the statsskip
      // lesson: a reused plan serves later samples from shuffle files,
      // zeroing the decode tally).
      val digest = graft.sources.Bucketing.pathDigest(sfDir)
      val frag = graft.sources.Layouts.root(spark) + "/frag_li_" + digest
      graft.sources.PartitionedWrite.partitionedTable(spark,
        Tables(spark, sfDir, "lineitem"), frag, "l_smonth",
        year(col("l_shipdate")) * 100 + month(col("l_shipdate")),
        splitFiles = math.max(8, spark.sparkContext.defaultParallelism))
      val (tree, stats) = graft.queries.CoreQueries
        .rangedLineitem(spark, sfDir)
      def window(df: DataFrame) = df
        .filter(col("l_shipdate") >= to_timestamp(lit("1997-03-05")) &&
          col("l_shipdate") <= to_timestamp(lit("1997-03-12")))
        .groupBy(col("l_returnflag"))
        .agg(sum(col("l_extendedprice").cast("decimal(28,2)"))
          .cast("double").as("rev"), count(lit(1)).as("n_rows"))
      def hashDir = window(spark.read.parquet(frag)
        .filter(col("l_smonth") === 199703))
      def rangeDir = window(spark.read.parquet(tree)
        .filter(col("l_smonth") === 199703))
      def fileSkip = graft.queries.CoreQueries
        .q58_file_skipping(spark, sfDir)
      val monthFiles = spark.read.parquet(stats)
        .filter(col("l_smonth") === 199703).count()
      val liveFiles = spark.read.parquet(stats)
        .filter(col("max_ship") >= to_timestamp(lit("1997-03-05")) &&
          col("min_ship") <= to_timestamp(lit("1997-03-12"))).count()
      val (hashSec, hashRows, hashBytes) = measureScanIO(spark, hashDir, n)
      val (dirSec, dirRows, dirBytes) = measureScanIO(spark, rangeDir, n)
      val (fileSecT, fileRowsT, fileBytes) = measureScanIO(spark, fileSkip, n)
      // q58's plan-time probe scans the |files|-row sidecar inside the
      // measured window — subtract it so file_rows_decoded is the DATA
      // decode (the dpp duel's dim-subtraction convention), and report
      // the probe size alongside: that probe is what reading a Delta
      // checkpoint costs, and it amortizes over every query while the
      // skipped files' decode does not.
      val statsProbeRows = spark.read.parquet(stats).count()
      val fileRows = fileRowsT - statsProbeRows
      def res(df: DataFrame) = df.collect().map(_.toSeq.toString).sorted.toSeq
      assert(res(fileSkip) == res(rangeDir) && res(fileSkip) == res(hashDir),
        "fileskip duel: relations diverge")
      println(f"""{"duel":"fileskip","sf":"$sfDir","hash_rows_decoded":$hashRows,"range_rows_decoded":$dirRows,"file_rows_decoded":$fileRows,"stats_probe_rows":$statsProbeRows,"rows_ratio":${hashRows.toDouble / math.max(1L, fileRows)}%.1f,"hash_bytes_read":$hashBytes,"range_bytes_read":$dirBytes,"file_bytes_read":$fileBytes,"month_files_listed":$monthFiles,"live_files_listed":$liveFiles,"hash_sec":$hashSec%.3f,"range_sec":$dirSec%.3f,"file_sec":$fileSecT%.3f}""")
    }

    if (which("bloomskip")) {
      // Bloom-sidecar duel: a POINT LOOKUP on a column the layout
      // doesn't cluster (l_partkey on q58's ship-date-tiled tree).
      // Every file's partkey min/max spans ~the whole domain, so
      // neither the dir-grain nor the envelope file-grain skip can
      // prune ANYTHING — the stock leg decodes whatever parquet's own
      // row-group partkey stats fail to exclude (≈ the table). The
      // bloom leg probes the |files|-row sidecar at plan time and
      // lists only the files that might contain the key (no false
      // negatives; ~3% FPs re-checked by the pushed residual). The
      // files_listed pair is the number that carries to object
      // storage: at 100k files/table a needle query opens a handful
      // of files instead of all of them. Probe rows subtracted and
      // reported separately, the fileskip convention.
      val (tree, stats) = graft.queries.CoreQueries
        .bloomedLineitem(spark, sfDir)
      def lookup(df: DataFrame) = df
        .filter(col("l_partkey") === 17L)
        .groupBy(col("l_returnflag"))
        .agg(sum(col("l_extendedprice").cast("decimal(28,2)"))
          .cast("double").as("rev"), count(lit(1)).as("n_rows"))
      def plain = lookup(spark.read.parquet(tree))
      def bloomed = graft.queries.CoreQueries
        .q66_bloom_skipping(spark, sfDir)
      val totalFiles = spark.read.parquet(stats).count()
      val (plainSec, plainRows, plainBytes) = measureScanIO(spark, plain, n)
      val (bSec, bRowsT, bBytes) = measureScanIO(spark, bloomed, n)
      val bRows = bRowsT - totalFiles // plan-time probe, reported apart
      val listedFiles = {
        // the files the bloom actually kept, from the executed plan
        import org.apache.spark.sql.execution._
        import org.apache.spark.sql.execution.adaptive._
        def scans(p: SparkPlan): Seq[FileSourceScanExec] = {
          val here = p match {
            case s: FileSourceScanExec => Seq(s); case _ => Nil }
          val kids = p match {
            case a: AdaptiveSparkPlanExec => Seq(a.executedPlan)
            case q: QueryStageExec => Seq(q.plan)
            case other => other.children }
          here ++ kids.flatMap(scans)
        }
        val q = bloomed
        q.collect()
        scans(q.queryExecution.executedPlan)
          .map(_.metrics("numFiles").value).max
      }
      def res(df: DataFrame) = df.collect().map(_.toSeq.toString).sorted.toSeq
      assert(res(bloomed) == res(plain), "bloomskip duel: relations diverge")
      println(f"""{"duel":"bloomskip","sf":"$sfDir","bloom_rows_decoded":$bRows,"plain_rows_decoded":$plainRows,"stats_probe_rows":$totalFiles,"rows_ratio":${plainRows.toDouble / math.max(1L, bRows)}%.1f,"bloom_bytes_read":$bBytes,"plain_bytes_read":$plainBytes,"files_listed":$listedFiles,"files_total":$totalFiles,"bloom_sec":$bSec%.3f,"plain_sec":$plainSec%.3f}""")
    }

    if (which("mergecow")) {
      // CDC write-back duel: the SAME changeset applied to the same
      // month-partitioned orders tree via MergeInto.copyOnWrite
      // (dynamic overwrite of touched directories only) vs the naive
      // full rewrite (merge-on-read relation written back over the
      // whole tree). Both produce the identical relation (asserted by
      // count + order-free hash below); the numbers that carry to
      // 100 TB are dirs_rewritten and bytes_written — a CDC batch
      // touching 2 of ~80 month directories should rewrite ~2/80 of
      // the table's bytes, and the full-rewrite wall grows with the
      // CORPUS while the COW wall grows with the batch.
      val digest = graft.sources.Bucketing.pathDigest(sfDir)
      val cowDir = graft.sources.Layouts.root(spark) + "/merge_cow_" + digest
      val cowDir2 = graft.sources.Layouts.root(spark) + "/merge_cowi_" + digest
      val fullDir = graft.sources.Layouts.root(spark) + "/merge_full_" + digest
      def monthCol = year(col("o_orderdate")) * 100 + month(col("o_orderdate"))
      val snapSrc = Tables(spark, sfDir, "orders")
        .select(col("o_orderkey"), col("o_custkey"), col("o_totalprice"),
          col("o_orderpriority"), monthCol.as("o_month"))
      snapSrc.write.mode("overwrite").partitionBy("o_month").parquet(cowDir)
      snapSrc.write.mode("overwrite").partitionBy("o_month").parquet(cowDir2)
      def dirStats(path: String): Map[String, (Int, Long, Long)] = {
        val root = new org.apache.hadoop.fs.Path(path)
        val fs = root.getFileSystem(spark.sparkContext.hadoopConfiguration)
        fs.listStatus(root).iterator
          .filter(d => d.isDirectory && d.getPath.getName.contains("="))
          .map { d =>
            val fls = fs.listStatus(d.getPath)
              .filter(f => f.isFile && !f.getPath.getName.startsWith("_"))
            d.getPath.getName ->
              ((fls.length, fls.map(_.getLen).sum, fls.map(_.getModificationTime).max))
          }.toMap
      }
      val before = dirStats(cowDir)
      val snap = spark.read.parquet(cowDir)
      // changeset confined to two mid-corpus months present at every
      // SF (orders span 1992-01..1998-08): updates+inserts in 199801,
      // deletes in 199806 — ~2 of ~80 directories touched
      val (mU, mD) = (199801, 199806)
      val mcol = col("o_month")
      val upd = snap.filter(mcol === mU && pmod(col("o_orderkey"), lit(5L)) === 1)
        .select(col("o_orderkey"), col("o_custkey"),
          (col("o_totalprice") + 1000.0).as("o_totalprice"),
          col("o_orderpriority"), col("o_month"), lit("U").as("op"))
      val del = snap.filter(mcol === mD && pmod(col("o_orderkey"), lit(5L)) === 2)
        .select(col("o_orderkey"), col("o_custkey"), col("o_totalprice"),
          col("o_orderpriority"), col("o_month"), lit("D").as("op"))
      val ins = snap.filter(mcol === mU && pmod(col("o_orderkey"), lit(5L)) === 3)
        .select((-col("o_orderkey")).as("o_orderkey"), col("o_custkey"),
          (col("o_totalprice") * 0.5).as("o_totalprice"),
          col("o_orderpriority"), col("o_month"), lit("I").as("op"))
      val changes = upd.unionByName(del).unionByName(ins)
        .localCheckpoint(true) // changeset derives from the tree the COW rewrites
      val t0 = System.nanoTime()
      graft.operators.MergeInto(snap, changes, "o_orderkey")
        .write.mode(org.apache.spark.sql.SaveMode.Overwrite)
        .partitionBy("o_month").parquet(fullDir)
      val fullSec = (System.nanoTime() - t0) / 1e9
      val t1 = System.nanoTime()
      graft.operators.MergeInto.copyOnWrite(
        spark, cowDir, "o_month", changes, "o_orderkey")
      val cowSec = (System.nanoTime() - t1) / 1e9
      // the immutable-partition-key fast path: affected dirs from the
      // changeset alone — no snapshot probe scan (this changeset
      // conforms: U/D rows carry their row's current month)
      val t2 = System.nanoTime()
      graft.operators.MergeInto.copyOnWrite(
        spark, cowDir2, "o_month", changes, "o_orderkey",
        partitionKeyImmutable = true)
      val cowImmSec = (System.nanoTime() - t2) / 1e9
      val after = dirStats(cowDir)
      val rewritten = after.filter { case (d, st) => before.get(d) != Some(st) }
      val cowBytes = rewritten.values.map(_._2).sum
      val fullStats = dirStats(fullDir)
      val fullBytes = fullStats.values.map(_._2).sum
      def sig(path: String): (Long, java.math.BigDecimal) = {
        // order-free row hash; decimal sum — a raw long sum overflows
        // ANSI arithmetic at 150k rows of full-range xxhash64 values.
        // o_month (cast: the partition column's inferred type must not
        // depend on which directory a row landed in) is IN the hash —
        // the duel's whole claim is per-directory rewrite, so a row
        // merged into the WRONG partition directory must break the
        // equivalence assert, not just the byte tallies (r16 advice).
        val r = spark.read.parquet(path)
          .agg(count(lit(1)),
            sum(xxhash64(col("o_orderkey"), col("o_custkey"),
              col("o_totalprice"), col("o_orderpriority"),
              col("o_month").cast("long"))
              .cast("decimal(38,0)")))
          .head()
        (r.getLong(0), r.getDecimal(1))
      }
      assert(sig(cowDir) == sig(fullDir),
        "mergecow duel: COW and full-rewrite relations diverge")
      assert(sig(cowDir2) == sig(fullDir),
        "mergecow duel: immutable-key COW diverges")
      println(f"""{"duel":"mergecow","sf":"$sfDir","dirs_total":${after.size},"dirs_rewritten":${rewritten.size},"cow_bytes":$cowBytes,"full_bytes":$fullBytes,"bytes_ratio":${fullBytes.toDouble / math.max(1L, cowBytes)}%.1f,"cow_sec":$cowSec%.3f,"cow_imm_sec":$cowImmSec%.3f,"full_sec":$fullSec%.3f}""")
    }

    if (which("bloom")) {
      // Runtime ROW filtering duel: q49's join shape in the regime
      // the bloom exists for — the dim too big to broadcast as a hash
      // relation (broadcast disabled), so the join is sort-merge and
      // BOTH sides shuffle. custom = fact pre-filtered by the 1-row
      // bloom of the dim's keys before its exchange; stock = the
      // plain join. Same output (superset-pass, BloomJoinSpec); the
      // scale number is custom_shuffle_rows — ~selectivity·|fact| +
      // FPP instead of |fact|.
      import graft.functions.GraftExpressions
      val dimPred = col("o_orderpriority") === "1-URGENT" &&
        col("o_totalprice") > 450000.0
      def dim = Tables(spark, sfDir, "orders").filter(dimPred)
      def li = Tables(spark, sfDir, "lineitem")
      def agg(df: DataFrame) = df
        .groupBy(col("l_returnflag"))
        .agg(sum(col("l_extendedprice")).as("rev"), count(lit(1)).as("n"))
      val prevBc = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
      try {
        def bloom = dim
          .agg(GraftExpressions.bloomAgg(col("o_orderkey"), 1000000L)
            .as("bf")).scalar()
        val custom = measure(spark, agg(
          li.filter(GraftExpressions.bloomMightContain(bloom, col("l_orderkey")))
            .join(dim, col("l_orderkey") === col("o_orderkey"))), n)
        val stock = measure(spark, agg(
          li.join(dim, col("l_orderkey") === col("o_orderkey"))), n)
        report("bloom_prefilter_vs_plain_join", custom, stock, sfDir)
      } finally spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prevBc)
    }

    if (which("hist")) {
      // q43's mergeable (group, bin) histogram vs the exact
      // `percentile()` aggregate on the same column. The exact
      // aggregate's partial buffer carries EVERY value of the group
      // through the exchange (that is what makes it exact — and what
      // OOMs a hot group at scale); the histogram's partials collapse
      // map-side to occupied bins, so its shuffle is ~|partitions|·
      // |bins| short rows regardless of data volume. Wall time at
      // small SF mostly tracks the scan; shuffle bytes are the
      // scale-limiting number the duel exists to record.
      val custom = measure(spark,
        SparkEntry.queries("q43_histogram_quantile")(spark, sfDir), n)
      val stock = measure(spark, Tables(spark, sfDir, "lineitem")
        .groupBy(col("l_returnflag"))
        .agg(expr("percentile(l_extendedprice, 0.25)").as("p25"),
          expr("percentile(l_extendedprice, 0.5)").as("p50"),
          expr("percentile(l_extendedprice, 0.75)").as("p75"),
          count(lit(1)).as("n")), n)
      report("hist_quantile_vs_exact_percentile", custom, stock, sfDir)
    }

    if (which("bucketedsym")) {
      // The iterative g-family's layout duel: converged connected
      // components with the symmetrized edge relation read from a
      // src-BUCKETED table vs the in-memory distinct. Broadcast is
      // disabled — the at-scale regime where the frontier outgrows
      // the driver — so the plain side must shuffle the EDGE table's
      // rows into every round's join, while the bucketed side reads
      // co-located bucket files and only the frontier moves
      // (GraphBucketedSpec pins the plan; this records the traffic).
      import graft.queries.GraphQueries
      import org.apache.spark.storage.StorageLevel
      val e = GraphQueries.derivedEdges(spark, sfDir)
      val sym = e.union(e.select(col("dst"), col("src")))
        .toDF("src", "dst").distinct()
        .persist(StorageLevel.MEMORY_AND_DISK)
      sym.count()
      val bsym = graft.sources.Bucketing.bucketedTable(
        spark, sym, "duel_sym_bucketed", cpus.toInt, "src")
      val prevBc = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
      // Unlike `measure` (fixed plan ⇒ identical tallies every run),
      // a converged-CC run's traffic can shift between samples (AQE
      // decisions, cache state), so each sample keeps ITS tally and
      // the reported records/bytes are the median-time sample's — the
      // same run the reported seconds come from.
      def measureCc(symRel: org.apache.spark.sql.DataFrame)
          : (Double, Long, Long) = {
        val samples = (1 to n).map { _ =>
          val tally = new ShuffleTally
          spark.sparkContext.addSparkListener(tally)
          val t0 = System.nanoTime()
          val out = graft.graph.GraphOps.connectedComponentsFromSym(symRel)
          out.queryExecution.toRdd.count()
          val sec = (System.nanoTime() - t0) / 1e9
          org.apache.spark.sql.graft.ColumnBridge
            .drainListenerBus(spark.sparkContext)
          spark.sparkContext.removeSparkListener(tally)
          org.apache.spark.sql.graft.ColumnBridge.releaseCheckpoint(out)
          (sec, tally.records.get(), tally.bytes.get())
        }
        samples.sortBy(_._1).apply(samples.length / 2)
      }
      try {
        val custom = measureCc(bsym)
        val stock = measureCc(sym)
        report("cc_bucketed_vs_inmemory_sym", custom, stock, sfDir)
      } finally {
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prevBc)
        sym.unpersist(false)
        spark.sql("DROP TABLE IF EXISTS duel_sym_bucketed")
      }
    }

    if (which("bucketededges")) {
      // The FLAGSHIP family's layout duel: a 3-pass fixed-point
      // PageRank with the directed edge relation read from a
      // src-bucketed table vs the in-memory relation. Broadcast is
      // disabled (minus the 1-row scalar hints) — the regime where
      // ranks outgrow the driver — so the plain side must shuffle the
      // edge table into every round's contribution join, while the
      // bucketed side reads co-located bucket files and only the
      // node-sized rank relation moves (GraphBucketedSpec pins the
      // plan; this records the traffic). Both sides drive the REAL
      // round builder (GraphQueries.pagerankRound), memo-free.
      import graft.queries.GraphQueries
      import org.apache.spark.storage.StorageLevel
      val e = GraphQueries.derivedEdges(spark, sfDir)
      val nodes = GraphQueries.derivedNodes(spark, sfDir)
      val deg = GraphQueries.outDeg(spark, sfDir)
      val nn = broadcast(nodes.agg(count(lit(1)).as("nn")))
      // settle the shared persisted relations OUTSIDE the timed region
      e.queryExecution.toRdd.count()
      nodes.queryExecution.toRdd.count()
      deg.queryExecution.toRdd.count()
      val be = graft.sources.Bucketing.bucketedTable(
        spark, e, "duel_edges_bucketed", cpus.toInt, "src")
      val prevBc = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
      def measurePr(eRel: org.apache.spark.sql.DataFrame)
          : (Double, Long, Long) = {
        val samples = (1 to n).map { _ =>
          val tally = new ShuffleTally
          spark.sparkContext.addSparkListener(tally)
          val t0 = System.nanoTime()
          var pins = List.empty[org.apache.spark.sql.DataFrame]
          var r = GraphQueries.pagerankInit(nodes, nn)
          (1 to 3).foreach { _ =>
            val withDeg = r.join(deg, Seq("node"), "left_outer")
              .persist(StorageLevel.MEMORY_AND_DISK)
            pins ::= withDeg
            r = GraphQueries.pagerankRound(eRel, nodes, withDeg, nn,
              divideByOutdeg = true)
          }
          r.queryExecution.toRdd.count()
          val sec = (System.nanoTime() - t0) / 1e9
          org.apache.spark.sql.graft.ColumnBridge
            .drainListenerBus(spark.sparkContext)
          spark.sparkContext.removeSparkListener(tally)
          pins.foreach(_.unpersist(false))
          (sec, tally.records.get(), tally.bytes.get())
        }
        samples.sortBy(_._1).apply(samples.length / 2)
      }
      try {
        val custom = measurePr(be)
        val stock = measurePr(e)
        report("pagerank_bucketed_vs_inmemory_edges", custom, stock, sfDir)
      } finally {
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prevBc)
        spark.sql("DROP TABLE IF EXISTS duel_edges_bucketed")
      }
    }

    if (which("hits")) {
      // The MUTUAL-recurrence layout duel: 2-round HITS with the edge
      // table read from the both-orientations bucketed layout (src
      // copy feeding the auth half, dst copy the hub half —
      // GraphQueries.loopEdges/loopEdgesDst) vs the in-memory
      // relation. Broadcast is disabled minus the 1-row MAX hints —
      // the regime where the score vectors outgrow the driver — so
      // the plain side must shuffle the edge table TWICE per round
      // (once per orientation; no single-key layout can serve both),
      // while the bucketed side reads co-located bucket files and
      // only node-sized score relations move (GraphBucketedSpec pins
      // the plan; this records the traffic). Both sides drive the
      // REAL loop (GraphQueries.hitsLoop), round-memo cleared per
      // sample so every sample runs both full rounds.
      import graft.queries.GraphQueries
      // settle the shared persisted relations OUTSIDE the timed region
      GraphQueries.derivedEdges(spark, sfDir).queryExecution.toRdd.count()
      GraphQueries.derivedNodes(spark, sfDir).queryExecution.toRdd.count()
      val prevBc = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
      def measureHits(bucketed: Boolean): (Double, Long, Long) = {
        if (bucketed) {
          spark.conf.set("graft.bucketedEdges", cpus)
          // one-time layout write (both orientations), outside samples
          GraphQueries.clearCheckpointMemos(spark)
          GraphQueries.hitsLoop(spark, sfDir, 1).queryExecution.toRdd.count()
        } else spark.conf.unset("graft.bucketedEdges")
        val samples = (1 to n).map { _ =>
          GraphQueries.clearCheckpointMemos(spark)
          val tally = new ShuffleTally
          spark.sparkContext.addSparkListener(tally)
          val t0 = System.nanoTime()
          GraphQueries.hitsLoop(spark, sfDir, 2).queryExecution.toRdd.count()
          val sec = (System.nanoTime() - t0) / 1e9
          org.apache.spark.sql.graft.ColumnBridge
            .drainListenerBus(spark.sparkContext)
          spark.sparkContext.removeSparkListener(tally)
          (sec, tally.records.get(), tally.bytes.get())
        }
        samples.sortBy(_._1).apply(samples.length / 2)
      }
      try {
        val custom = measureHits(bucketed = true)
        val stock = measureHits(bucketed = false)
        report("hits_bucketed_vs_inmemory_edges", custom, stock, sfDir)
      } finally {
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prevBc)
        spark.conf.unset("graft.bucketedEdges")
        GraphQueries.clearCheckpointMemos(spark)
      }
    }

    if (which("band")) {
      val custom = measure(spark,
        SparkEntry.queries("q38_band_join")(spark, sfDir), n)
      spark.conf.set("spark.graft.rangeJoinBinning", "false")
      val stock = measure(spark,
        SparkEntry.queries("q38_band_join")(spark, sfDir), n)
      spark.conf.set("spark.graft.rangeJoinBinning", "true")
      report("band_binned_vs_nested_loop", custom, stock, sfDir)
    }

    spark.stop()
  }
}
