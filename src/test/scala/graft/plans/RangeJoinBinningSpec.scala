package graft.plans

import graft.TestSpark
import graft.functions.GraftExpressions
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** The binning rewrite must be invisible in VALUES (identical rows
  * with the rule on or off, nulls and negatives included) and visible
  * in the PLAN (nested-loop join gone). The DuckDB oracle re-checks
  * q38's values cross-engine; this spec owns the A/B and the guards.
  */
class RangeJoinBinningSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  private val dir = "/root/testdata/sf0.001"

  private def withRuleOff[A](f: => A): A = {
    spark.conf.set(RangeJoinBinning.ConfKey, "false")
    try f finally spark.conf.set(RangeJoinBinning.ConfKey, "true")
  }

  private def anchors: DataFrame =
    Seq[(Long, Option[Long])](
      (1L, Some(-250L)), (2L, Some(-100L)), (3L, Some(-1L)),
      (4L, Some(0L)), (5L, Some(1L)), (6L, Some(99L)), (7L, Some(100L)),
      (8L, Some(101L)), (9L, Some(350L)), (10L, None), (11L, Some(0L)))
      .toDF("aid", "asec")

  private def probes: DataFrame =
    Seq[(Long, Option[Long])](
      (21L, Some(-300L)), (22L, Some(-201L)), (23L, Some(-150L)),
      (24L, Some(-99L)), (25L, Some(-1L)), (26L, Some(0L)),
      (27L, Some(1L)), (28L, Some(50L)), (29L, Some(100L)),
      (30L, Some(101L)), (31L, Some(199L)), (32L, Some(200L)),
      (33L, Some(201L)), (34L, Some(450L)), (35L, None))
      .toDF("pid", "psec")

  private def bandJoin: DataFrame =
    anchors.join(probes,
      col("psec") > col("asec") && col("psec") <= col("asec") + lit(100L))
      .select(col("aid"), col("pid"))

  private def rows(df: DataFrame): Seq[(Long, Long)] =
    df.as[(Long, Long)].collect().toSeq.sorted

  test("band join: binned rows == naive rows (negatives, bounds, nulls)") {
    val binned = rows(bandJoin)
    val naive = withRuleOff(rows(bandJoin))
    assert(binned === naive)
    // Spot-check the model directly: (anchor, anchor+100] inclusive
    // upper, exclusive lower, floored bins across zero.
    val a = anchors.as[(Long, Option[Long])].collect().toMap
    val p = probes.as[(Long, Option[Long])].collect().toMap
    val model = for {
      (aid, Some(as)) <- a.toSeq
      (pid, Some(ps)) <- p.toSeq
      if ps > as && ps <= as + 100L
    } yield (aid, pid)
    assert(binned === model.sorted)
  }

  test("the rewrite fires: no nested-loop join, Expand + equi-join") {
    val plan = bandJoin.queryExecution
    val physical = plan.executedPlan.toString
    assert(!physical.contains("BroadcastNestedLoopJoin"), physical)
    assert(!physical.contains("CartesianProduct"), physical)
    assert(physical.contains("Expand"), physical)
    assert(physical.contains("__graft_band_bin"), physical)
    assert(plan.optimizedPlan.toString.contains("FloorDiv") ||
      plan.optimizedPlan.toString.contains("graft_floordiv"),
      plan.optimizedPlan.toString)
  }

  test("rule off: the naive nested-loop plan comes back") {
    withRuleOff {
      val physical = bandJoin.queryExecution.executedPlan.toString
      assert(physical.contains("BroadcastNestedLoopJoin") ||
        physical.contains("CartesianProduct"), physical)
    }
  }

  test("guard: a join that already has an equi key is left alone") {
    val l = Seq((1L, 10L), (2L, 20L)).toDF("k", "asec")
    val r = Seq((1L, 15L), (2L, 200L)).toDF("k2", "psec")
    val joined = l.join(r,
      col("k") === col("k2") &&
        col("psec") > col("asec") && col("psec") <= col("asec") + lit(100L))
    val physical = joined.queryExecution.executedPlan.toString
    assert(!physical.contains("__graft_band_bin"), physical)
    assert(rows(joined.select(col("k"), col("k2"))) === Seq((1L, 1L)))
  }

  test("guard: outer band joins are not rewritten") {
    val j = anchors.join(probes,
      col("psec") > col("asec") && col("psec") <= col("asec") + lit(100L),
      "left")
    val physical = j.queryExecution.executedPlan.toString
    assert(!physical.contains("__graft_band_bin"), physical)
    // and values: every anchor survives, matched or not
    assert(j.count() >= anchors.count())
  }

  test("q38 on testdata: binned == naive, plan is the binned one") {
    val q = graft.SparkEntry.queries("q38_band_join")
    val binned = q(spark, dir).collect().map(_.toSeq).toSeq
      .sortBy(_.toString)
    val naive = withRuleOff(q(spark, dir).collect().map(_.toSeq).toSeq
      .sortBy(_.toString))
    assert(binned.nonEmpty)
    assert(binned === naive)
    val physical = q(spark, dir).queryExecution.executedPlan.toString
    assert(!physical.contains("BroadcastNestedLoopJoin"), physical)
  }

  test("FloorDiv floors toward -inf (Math.floorDiv parity, codegen path)") {
    val xs = Seq(-201L, -200L, -101L, -100L, -1L, 0L, 1L, 99L, 100L,
      101L, Long.MaxValue, Long.MinValue + 1)
    val got = xs.toDF("x")
      .select(GraftExpressions.floorDiv(col("x"), lit(100L)))
      .as[Long].collect().toSeq
    assert(got === xs.map(Math.floorDiv(_, 100L)))
    // SQL surface
    val viaSql = spark.sql(
      "SELECT graft_floordiv(CAST(-201 AS BIGINT), CAST(100 AS BIGINT))")
    assert(viaSql.head().getLong(0) === -3L)
  }
}
