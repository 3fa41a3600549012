package graft.sources

import graft.{Tables, TestSpark}
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Pins [[Compaction]]'s layout contracts — the side the DuckDB hash
  * (q51's oracle) cannot see: file counts collapse at the default
  * target, the per-directory width ADAPTS to a small target without
  * exceeding the plan, content survives as an exact multiset, and the
  * compacted tree still partition-prunes. q51's registry hash pins the
  * row-exactness of the same rewrite at every SF.
  */
class CompactionSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark

  private val dir = "/root/testdata/sf0.001"

  private def ms(df: org.apache.spark.sql.DataFrame): Seq[String] =
    df.collect().map(_.toSeq.map(String.valueOf).mkString("|")).sorted.toSeq

  private lazy val frag: String = {
    val p = "target/test_frag_li"
    PartitionedWrite.partitionedTable(spark,
      Tables(spark, dir, "lineitem"), p, "l_smonth",
      year(col("l_shipdate")) * 100 + month(col("l_shipdate")),
      splitFiles = 4)
    p
  }

  test("default target collapses every directory to one file, losing no rows") {
    val before = Compaction.fileCounts(spark, frag)
    assert(before.values.sum > before.size,
      s"fixture not fragmented: $before")
    val out = Compaction.compact(spark, frag, "target/test_compact_li",
      "l_smonth", 128L * 1024 * 1024)
    val after = Compaction.fileCounts(spark, "target/test_compact_li")
    assert(after.keySet === before.keySet, "directory set changed")
    assert(after.values.forall(_ === 1), s"not collapsed: $after")
    // exact multiset survival, column order normalized (partitionBy
    // moves the partition column; compare by sorted column name)
    val cols = spark.read.parquet(frag).columns.sorted.map(col)
    assert(ms(out.select(cols: _*)) ===
      ms(spark.read.parquet(frag).select(cols: _*)))
  }

  test("a small target plans adaptive multi-file widths and the write respects them as ceilings") {
    // 4 KB target on sf0.001's month directories (~15-40 KB each)
    // forces n > 1 for the populated months
    val plan = Compaction.filePlan(spark, frag, 4L * 1024)
    assert(plan.values.exists(_ > 1), s"target too coarse: $plan")
    val out = Compaction.compact(spark, frag, "target/test_compact_li4k",
      "l_smonth", 4L * 1024)
    val after = Compaction.fileCounts(spark, "target/test_compact_li4k")
    after.foreach { case (pv, n) =>
      assert(n >= 1 && n <= plan(pv),
        s"dir $pv: $n files vs plan ${plan(pv)} (slots may only MERGE)")
    }
    assert(after.values.sum > after.size, "adaptive width never engaged")
    val cols = spark.read.parquet(frag).columns.sorted.map(col)
    assert(ms(out.select(cols: _*)) ===
      ms(spark.read.parquet(frag).select(cols: _*)))
  }

  test("partition pruning still prunes on the compacted tree") {
    Compaction.compact(spark, frag, "target/test_compact_li_p",
      "l_smonth", 128L * 1024 * 1024)
    val probe = spark.read.parquet("target/test_compact_li_p")
      .filter(col("l_smonth") === 199803)
    probe.collect()
    val scans = probe.queryExecution.executedPlan.collect {
      case s: org.apache.spark.sql.execution.FileSourceScanExec => s
    }
    assert(scans.nonEmpty)
    assert(scans.head.partitionFilters.mkString(";").contains("l_smonth"))
    assert(scans.head.metrics("numPartitions").value === 1)
  }
}
