package graft.sources

import graft.TestSpark
import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._

/** Pins [[StatsStore]]'s maintenance contract (r16 verdict item 3):
  * after a copy-on-write merge or a compaction, the hook-refreshed
  * sidecar EQUALS a from-scratch recomputation, the refresh never
  * re-scans the corpus (its scan's input files stay inside the
  * affected directories), and a q55-style zone-map probe over the
  * refreshed sidecar prunes CORRECTLY on the mutated tree — fresh
  * envelopes, not the stale ones the r16 verdict flagged.
  */
class StatsStoreSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  private val cols = Seq(
    StatsStore.ColSpec("price", "min_p", "max_p"),
    StatsStore.ColSpec("d", "min_d", "max_d"))

  private def ms(df: org.apache.spark.sql.DataFrame): Seq[String] = {
    val c = df.columns.sorted.map(col)
    df.select(c.toIndexedSeq: _*).collect()
      .map(_.toSeq.map(String.valueOf).mkString("|")).sorted.toSeq
  }

  // 4 partitions m=1..4, 8 rows each; d spans [m*100, m*100+7],
  // price spans [m*10, m*10+7]
  private def table = (0L until 32L)
    .map(k => (k, (k % 4 + 1) * 10.0 + k / 4, (k % 4 + 1) * 100 + k / 4,
      k % 4 + 1))
    .toDF("k", "price", "d", "m")

  test("copyOnWrite with a DirStatsHook leaves the sidecar equal to a from-scratch recomputation (envelope growth, shrink, and full delete)") {
    val tree = "target/test_stats_cow"
    val stats = "target/test_stats_cow_sidecar"
    table.write.mode("overwrite").partitionBy("m").parquet(tree)
    StatsStore.writeDirStats(spark, tree, stats, "m", cols)
    // m=1 gains a row with d far beyond its old envelope; m=2's
    // max-price row is updated DOWN (envelope must shrink — the case
    // a stale zone map gets wrong); m=3 is emptied entirely
    val m3keys = (0L until 32L).filter(_ % 4 == 2) // k%4=2 → m=3
    val changes = (m3keys.map(k => (k, 0.0, 0, 3L, "D")) ++ Seq(
      (999L, 11.0, 950, 1L, "I"),
      // k=29 → m=2's max price (27.0) and max d (207): rewrite low
      (29L, 20.5, 200, 2L, "U")
    )).toDF("k", "price", "d", "m", "op")
    graft.operators.MergeInto.copyOnWrite(spark, tree, "m", changes, "k",
      hooks = Seq(StatsStore.DirStatsHook(stats, cols)))
    val refreshed = spark.read.parquet(stats)
    val scratch = StatsStore.dirStats(spark.read.parquet(tree), "m", cols)
    assert(ms(refreshed) === ms(scratch))
    // the emptied partition's stats row dropped out
    assert(refreshed.filter($"m" === 3).count() === 0L)
    // the shrunk envelope is really shrunk (not the stale max)
    val m2 = refreshed.filter($"m" === 2)
      .select("max_p", "max_d").head()
    assert(m2.getDouble(0) === 26.0 && m2.getLong(1) === 206L)
  }

  test("the refresh scan never leaves the affected directories (no corpus re-scan)") {
    val tree = "target/test_stats_slice"
    table.write.mode("overwrite").partitionBy("m").parquet(tree)
    val sliced = StatsStore.slice(spark, tree, "m", Seq(2L, 3L))
    sliced.collect()
    // `inputFiles` is plan-level metadata (the unpruned listing);
    // pruning shows in the executed scan's numPartitions metric —
    // the same evidence PartitionedSpec pins for q47/q55
    def scans(p: org.apache.spark.sql.execution.SparkPlan)
        : Seq[org.apache.spark.sql.execution.FileSourceScanExec] = {
      import org.apache.spark.sql.execution._
      import org.apache.spark.sql.execution.adaptive._
      val here = p match {
        case s: FileSourceScanExec => Seq(s); case _ => Nil
      }
      val kids = p match {
        case a: AdaptiveSparkPlanExec => Seq(a.executedPlan)
        case q: QueryStageExec => Seq(q.plan)
        case other => other.children
      }
      here ++ kids.flatMap(scans)
    }
    val scan = scans(sliced.queryExecution.executedPlan).head
    assert(scan.metrics("numPartitions").value === 2,
      s"refresh slice read ${scan.metrics("numPartitions").value} " +
        "directories, expected exactly the 2 affected")
  }

  test("a q55-style zone-map probe over the refreshed sidecar prunes correctly on the mutated tree") {
    val tree = "target/test_stats_probe"
    val stats = "target/test_stats_probe_sidecar"
    table.write.mode("overwrite").partitionBy("m").parquet(tree)
    StatsStore.writeDirStats(spark, tree, stats, "m", cols)
    // window [300, 410]: pre-merge it intersects m=3 (300..307) and
    // m=4 (400..407). The merge EMPTIES m=3 and inserts a d=310 row
    // into m=1 — post-merge the window must keep m=1 and m=4 only.
    val m3keys = (0L until 32L).filter(_ % 4 == 2)
    val changes = (m3keys.map(k => (k, 0.0, 0, 3L, "D")) :+
      ((888L, 12.0, 310, 1L, "I")))
      .toDF("k", "price", "d", "m", "op")
    graft.operators.MergeInto.copyOnWrite(spark, tree, "m", changes, "k",
      hooks = Seq(StatsStore.DirStatsHook(stats, cols)))
    val (lo, hi) = (300, 410)
    val live = spark.read.parquet(stats)
      .filter($"max_d" >= lo && $"min_d" <= hi)
      .select($"m".cast("long")).collect().map(_.getLong(0)).sorted.toSeq
    assert(live === Seq(1L, 4L),
      s"stale or wrong envelopes: probe kept $live")
    // and the pruned aggregation equals the plain one on the mutated
    // tree — the q55 superset-safety property, post-maintenance
    val t = spark.read.parquet(tree)
    val pruned = t.filter($"m".isInCollection(live))
      .filter($"d" >= lo && $"d" <= hi).agg(sum("price"), count(lit(1)))
      .head()
    val plain = t.filter($"d" >= lo && $"d" <= hi)
      .agg(sum("price"), count(lit(1))).head()
    assert(pruned === plain)
  }

  test("compaction with a FileStatsHook re-derives the per-file sidecar for the compacted tree") {
    val frag = "target/test_stats_frag"
    val dst = "target/test_stats_compacted"
    val stats = "target/test_stats_file_sidecar"
    // over-split source: several files per directory
    PartitionedWrite.partitionedTable(spark, table.drop("m"), frag, "m",
      (col("d") / lit(100)).cast("long"), splitFiles = 4)
    StatsStore.writeFileStats(spark, frag, stats, "m", cols)
    val before = spark.read.parquet(stats).count()
    Compaction.compact(spark, frag, dst, "m", targetBytes = 128L * 1024 * 1024,
      hooks = Seq(StatsStore.FileStatsHook(stats, cols)))
    val refreshed = spark.read.parquet(stats)
    val scratch = StatsStore.fileStats(spark.read.parquet(dst), "m", cols)
    assert(ms(refreshed) === ms(scratch))
    // compaction collapsed files, so the sidecar shrank with them
    assert(refreshed.count() < before)
    // per-file rows reference the COMPACTED tree's files
    assert(refreshed.select("file").collect().map(_.getString(0))
      .forall(_.startsWith("m=")))
  }
}
