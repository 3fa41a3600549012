package graft.queries

import graft.TestSpark
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Executes the "AQE handles skew" claim q05 rides on
  * (CoreQueries.scala — sort-merge fact⋈fact with no manual salting):
  * a synthesized hot-key join, AQE skew thresholds scaled down to the
  * fixture (production defaults trigger at 256 MB partitions — the
  * same geometry at cluster scale), and the EXECUTED plan must show
  * the skew-split sort-merge join (`skew=true`): the hot partition is
  * split into parallel sub-partitions joined against replicated
  * right-side reads, which is exactly the manual salt-and-replicate
  * dance (q26) done adaptively at runtime. Manual salting remains the
  * tool when the hot key is known AHEAD of the shuffle (it avoids
  * materializing the skewed map output at all); AQE covers the 100 TB
  * case where skew is data-dependent and discovered at runtime.
  */
class SkewJoinSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark

  test("AQE splits a runtime-skewed sort-merge join (skew=true in the executed plan)") {
    val confs = Seq(
      "spark.sql.autoBroadcastJoinThreshold" -> "-1",
      "spark.sql.adaptive.enabled" -> "true",
      "spark.sql.adaptive.skewJoin.enabled" -> "true",
      // scale the 256 MB/advisory-64 MB production thresholds down to
      // the fixture (same 5x-over-median trigger geometry)
      "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes" -> "16k",
      "spark.sql.adaptive.advisoryPartitionSizeInBytes" -> "8k",
      // local mode quirk: with one small stage AQE prefers coalescing
      // partitions, which can merge the skew away before the join
      // rule sees it — disable to expose the per-partition sizes the
      // skew rule inspects (a 1000-executor cluster would not coalesce
      // a hot partition into its neighbors either)
      "spark.sql.adaptive.coalescePartitions.enabled" -> "false")
    val prev = confs.map { case (k, _) => k -> spark.conf.getOption(k) }
    confs.foreach { case (k, v) => spark.conf.set(k, v) }
    try {
      import spark.implicits._
      // hot key 1: 100k rows on the left; 2000 quiet keys with ~10
      // rows each. Right side: uniform, a few rows per key. Two
      // lessons baked into the fixture (each cost a silent non-split):
      //  - the payload must be INCOMPRESSIBLE (xxhash64): skew
      //    detection reads COMPRESSED map-output sizes, and 100k rows
      //    of a constant key + arithmetic values lz4 to ~11 KB;
      //  - the payload must SURVIVE column pruning (the agg reads v):
      //    otherwise only the 8-byte key ships and there is no byte
      //    skew to detect. Measured map output with both in place:
      //    hot partition 1.24 MB vs ~80 KB quiet — 15x over median.
      val left = spark.range(100000)
        .select(lit(1L).as("k"), xxhash64($"id").as("v"))
        .union(spark.range(20000)
          .select(($"id" % 2000 + 2).as("k"), xxhash64($"id").as("v")))
      val right = spark.range(2001).select(($"id" + 1).as("k"),
        ($"id" * 7).as("w"))
      // aggregate on a NON-join key (q05's shape: join on orderkey,
      // group by priority) — the agg pays its own exchange, so the
      // skew rule is free to split the join partitioning. (Grouping
      // by the join key itself pins the join's partitioning to the
      // agg and legitimately suppresses the split.)
      val j = left.join(right, "k").groupBy(($"w" % 5).as("g"))
        .agg(count(lit(1)).as("n"), max($"v").as("mv"))
      val rows = j.collect()
      // correctness unaffected by the split: every row joins exactly once
      assert(rows.map(_.getLong(1)).sum === 120000L)
      val plan = j.queryExecution.executedPlan.toString
      assert(plan.contains("skew=true"),
        s"AQE did not split the skewed join:\n$plan")
    } finally prev.foreach {
      case (k, Some(v)) => spark.conf.set(k, v)
      case (k, None) => spark.conf.unset(k)
    }
  }
}
