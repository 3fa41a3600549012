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

  test("an epoch-evolved tree compacts to the union-of-footers schema — the late column survives, NULL before its epoch") {
    // The q53 layout composed with q51's compactor (the r15 verdict's
    // composition defect): epoch=0 files PREDATE the `o_comment`-like
    // late column, epoch=1 files carry it. Without mergeSchema the
    // compactor's source read trusts one sampled footer and silently
    // drops (or nulls) the late column depending on which epoch wins.
    val src = "target/test_evo_src"
    val snap = Tables(spark, dir, "orders")
    val even = pmod(col("o_orderkey"), lit(2L)) === 0
    snap.filter(even)
      .select(col("o_orderkey"), col("o_custkey"), col("o_totalprice"))
      .write.mode("overwrite").parquet(src + "/epoch=0")
    snap.filter(!even)
      .select(col("o_orderkey"), col("o_custkey"), col("o_totalprice"),
        col("o_orderpriority"))
      .write.mode("overwrite").parquet(src + "/epoch=1")
    val out = Compaction.compact(spark, src, "target/test_evo_compact",
      "epoch", 128L * 1024 * 1024)
    assert(out.columns.toSet ===
      Set("o_orderkey", "o_custkey", "o_totalprice", "o_orderpriority",
        "epoch"), s"late column lost: ${out.columns.mkString(",")}")
    val nulls = out.groupBy(col("epoch"))
      .agg(count(lit(1)).as("n"),
        count(col("o_orderpriority")).as("n_set"))
      .collect().map(r => r.getInt(0) -> (r.getLong(1), r.getLong(2)))
      .toMap
    assert(nulls(0)._1 > 0 && nulls(0)._2 === 0L,
      s"epoch-0 rows must carry NULL for the late column: $nulls")
    assert(nulls(1)._1 > 0 && nulls(1)._2 === nulls(1)._1,
      s"epoch-1 rows must keep their values: $nulls")
    // full multiset survival under the merged schema
    val cols = Seq("epoch", "o_orderkey", "o_custkey", "o_totalprice",
      "o_orderpriority").map(col)
    val merged = spark.read.option("mergeSchema", "true").parquet(src)
    assert(ms(out.select(cols: _*)) === ms(merged.select(cols: _*)))
  }

  test("a null partition value routes through __HIVE_DEFAULT_PARTITION__ instead of null-rejecting the directory") {
    // filePlan lists a null directory under hive's sentinel; the plan
    // join must coalesce to it or every row of that directory silently
    // vanishes from the compacted tree (r15 advice — the silent-loss
    // case the row-count assert also backstops).
    val src = "target/test_null_part_src"
    Tables(spark, dir, "orders")
      .select(col("o_orderkey"), col("o_totalprice"),
        when(col("o_orderkey") % 3 === 0, lit(null))
          .otherwise(col("o_orderpriority")).as("prio"))
      .write.mode("overwrite").partitionBy("prio").parquet(src)
    assert(Compaction.fileCounts(spark, src).keySet
      .contains("__HIVE_DEFAULT_PARTITION__"))
    val out = Compaction.compact(spark, src, "target/test_null_part_dst",
      "prio", 128L * 1024 * 1024)
    val srcN = spark.read.parquet(src).count()
    assert(out.count() === srcN)
    assert(out.filter(col("prio").isNull).count() ===
      spark.read.parquet(src).filter(col("prio").isNull).count())
  }

  test("a hive-escaped string partition value still routes (unescaped plan keys)") {
    // ':' is on hive's escape list — the directory is `pv=a%3Ab` while
    // the data column renders `a:b`; filePlan unescapes so the plan
    // join matches the column, and the row-count assert guards any
    // residual encoding divergence.
    val src = "target/test_esc_part_src"
    Tables(spark, dir, "region")
      .select(col("r_regionkey"), col("r_name"),
        concat(lit("k:"), col("r_regionkey")).as("pv"))
      .write.mode("overwrite").partitionBy("pv").parquet(src)
    val plan = Compaction.filePlan(spark, src, 128L * 1024 * 1024)
    assert(plan.keys.forall(_.startsWith("k:")), s"plan keys: $plan")
    val out = Compaction.compact(spark, src, "target/test_esc_part_dst",
      "pv", 128L * 1024 * 1024)
    assert(out.count() === spark.read.parquet(src).count())
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
