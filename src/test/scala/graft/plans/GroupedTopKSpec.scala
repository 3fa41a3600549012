package graft.plans

import graft.TestSpark
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** The custom operator must be invisible in VALUES — identical row
  * multiset to `row_number().over(...) <= k` for every k and group
  * shape — and visible in the PLAN: two GroupedTopK heap passes, one
  * exchange, no Sort and no Window anywhere. The DuckDB oracle
  * re-checks q39's values cross-engine; this spec owns the A/B and
  * the edges (k > group size, ties, nulls, empty input).
  */
class GroupedTopKSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  private val dir = "/root/testdata/sf0.001"

  private def events: DataFrame =
    graft.Tables(spark, dir, "events")
      .select(col("event_type"), col("event_id"), col("value"))

  private def windowTopK(df: DataFrame, group: String, k: Int): DataFrame = {
    val w = Window.partitionBy(col(group))
      .orderBy(col("value").desc, col("event_id").asc)
    df.withColumn("rn", row_number().over(w)).filter(col("rn") <= k)
      .drop("rn")
  }

  private def canon(df: DataFrame): Seq[String] =
    df.collect().map(_.toSeq.mkString("|")).toSeq.sorted

  test("top-k per group matches the window formulation (k = 1, 3, 5, 1000)") {
    for (k <- Seq(1, 3, 5, 1000)) {
      val custom = GroupedTopK.of(events, Seq("event_type"),
        Seq(("value", false), ("event_id", true)), k)
      assert(canon(custom) === canon(windowTopK(events, "event_type", k)),
        s"k=$k")
    }
  }

  test("ties on the order value are broken by the tiebreak, like row_number") {
    val df = Seq(
      ("a", 1L, 10.0), ("a", 2L, 10.0), ("a", 3L, 10.0), ("a", 4L, 5.0),
      ("b", 5L, 1.0)).toDF("g", "id", "v")
    val got = GroupedTopK.of(df, Seq("g"), Seq(("v", false), ("id", true)), 2)
      .select(col("g"), col("id")).as[(String, Long)].collect().toSet
    assert(got === Set(("a", 1L), ("a", 2L), ("b", 5L)))
  }

  test("null group keys form a group; null order values follow desc⇒last") {
    val df = Seq[(Option[String], Long, Option[Double])](
      (None, 1L, Some(3.0)), (None, 2L, Some(7.0)), (None, 3L, None),
      (Some("g"), 4L, None), (Some("g"), 5L, Some(1.0)))
      .toDF("g", "id", "v")
    val got = GroupedTopK.of(df, Seq("g"), Seq(("v", false), ("id", true)), 1)
      .select(col("id")).as[Long].collect().toSet
    // desc ⇒ nulls last, so the null-keyed group keeps id=2 (7.0) and
    // group "g" keeps id=5 (1.0 beats NULL).
    assert(got === Set(2L, 5L))
  }

  test("k larger than every group returns the input unchanged") {
    val n = events.count()
    val all = GroupedTopK.of(events, Seq("event_type"),
      Seq(("value", false), ("event_id", true)), 1000000)
    assert(all.count() === n)
  }

  test("empty input yields empty output with the child schema") {
    val empty = events.where(lit(false))
    val got = GroupedTopK.of(empty, Seq("event_type"),
      Seq(("value", false), ("event_id", true)), 3)
    assert(got.columns.toSeq === Seq("event_type", "event_id", "value"))
    assert(got.count() === 0)
  }

  test("plan: two heap passes, one exchange, no Sort, no Window") {
    val df = GroupedTopK.of(events, Seq("event_type"),
      Seq(("value", false), ("event_id", true)), 3)
    val physical = df.queryExecution.executedPlan.toString
    assert(physical.contains("GroupedTopKPartial"), physical)
    assert(physical.contains("GroupedTopKFinal"), physical)
    assert("Exchange".r.findAllIn(physical).size === 1, physical)
    assert(!physical.contains("Sort"), physical)
    assert(!physical.contains("Window"), physical)
  }

  test("the window formulation of the same query DOES sort (the contrast)") {
    val physical = windowTopK(events, "event_type", 3)
      .queryExecution.executedPlan.toString
    assert(physical.contains("Sort"), physical)
  }

  test("q39 on testdata matches its window twin") {
    val q39 = graft.SparkEntry.queries("q39_grouped_topk")(spark, dir)
    val orders = graft.Tables(spark, dir, "orders")
      .select(col("o_custkey"), col("o_orderkey"), col("o_totalprice"))
    val w = Window.partitionBy(col("o_custkey"))
      .orderBy(col("o_totalprice").desc, col("o_orderkey").asc)
    val twin = orders.withColumn("rn", row_number().over(w))
      .filter(col("rn") <= 3).drop("rn")
    assert(canon(q39) === canon(twin))
    assert(q39.count() > 0)
  }
}
