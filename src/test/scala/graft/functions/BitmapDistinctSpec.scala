package graft.functions

import graft.TestSpark
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** BitmapDistinct must be invisible in VALUES — exactly
  * `count_distinct` for every group shape, including nulls and empty
  * partials — and visible in the PLAN: a partial/final aggregation
  * pair (the map-side OR-merge is what makes one buffer per group,
  * not one row per distinct value, ride the exchange). The DuckDB
  * oracle re-checks q40 cross-engine; this spec owns the edges.
  */
class BitmapDistinctSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  private val dir = "/root/testdata/sf0.001"

  test("matches count_distinct per group on testdata, across partition counts") {
    val orders = graft.Tables(spark, dir, "orders")
    for (parts <- Seq(1, 7, 32)) {
      val src = orders.repartition(parts)
      val got = src.groupBy(col("o_orderpriority"))
        .agg(BitmapDistinct.of(col("o_custkey")).as("n"))
        .as[(String, Long)].collect().toMap
      val want = src.groupBy(col("o_orderpriority"))
        .agg(countDistinct(col("o_custkey")).as("n"))
        .as[(String, Long)].collect().toMap
      assert(got === want, s"parts=$parts")
    }
  }

  test("duplicates collapse; nulls are ignored; all-null group counts 0") {
    val df = Seq[(String, Option[Long])](
      ("a", Some(1L)), ("a", Some(1L)), ("a", Some(2L)), ("a", None),
      ("b", None), ("b", None)).toDF("g", "id")
    val got = df.groupBy(col("g")).agg(BitmapDistinct.of(col("id")).as("n"))
      .as[(String, Long)].collect().toMap
    assert(got === Map("a" -> 2L, "b" -> 0L))
  }

  test("global (ungrouped) aggregation works") {
    val n = graft.Tables(spark, dir, "orders")
      .agg(BitmapDistinct.of(col("o_custkey")).as("n")).as[Long].head()
    val want = graft.Tables(spark, dir, "orders")
      .agg(countDistinct(col("o_custkey"))).as[Long].head()
    assert(n === want)
  }

  test("integer id columns are accepted") {
    val df = Seq(("a", 1), ("a", 2), ("a", 2)).toDF("g", "id")
    val got = df.groupBy(col("g")).agg(BitmapDistinct.of(col("id")).as("n"))
      .as[(String, Long)].head()
    assert(got === (("a", 2L)))
  }

  test("out-of-range ids raise instead of silently dropping") {
    val over = Seq(("a", BitmapDistinct.DefaultMaxDomain.toLong)).toDF("g", "id")
    val exOver = intercept[Exception] {
      over.groupBy(col("g")).agg(BitmapDistinct.of(col("id"))).collect()
    }
    assert(exOver.getMessage.contains("graft_bitmap_distinct") ||
      Option(exOver.getCause).exists(_.getMessage.contains("graft_bitmap_distinct")))
    val neg = Seq(("a", -1L)).toDF("g", "id")
    val exNeg = intercept[Exception] {
      neg.groupBy(col("g")).agg(BitmapDistinct.of(col("id"))).collect()
    }
    assert(exNeg.getMessage.contains("graft_bitmap_distinct") ||
      Option(exNeg.getCause).exists(_.getMessage.contains("graft_bitmap_distinct")))
  }

  test("a tight explicit maxDomain is honored") {
    val df = Seq(("a", 0L), ("a", 9L)).toDF("g", "id")
    val got = df.groupBy(col("g"))
      .agg(BitmapDistinct.of(col("id"), maxDomain = 10).as("n"))
      .as[(String, Long)].head()
    assert(got === (("a", 2L)))
  }

  test("serialize/deserialize roundtrip preserves the bitmap, including empty") {
    val agg = BitmapDistinct(
      org.apache.spark.sql.catalyst.expressions.Literal(1L), 100)
    val b = agg.createAggregationBuffer()
    assert(agg.deserialize(agg.serialize(b)).cardinality() === 0)
    b.set(0); b.set(63); b.set(64); b.set(99)
    val rt = agg.deserialize(agg.serialize(b))
    assert(rt === b)
    assert(agg.eval(rt) === 4L)
  }

  test("SQL surface: graft_bitmap_distinct with and without maxDomain") {
    graft.Tables(spark, dir, "orders").createOrReplaceTempView("bd_orders")
    val a = spark.sql(
      """SELECT o_orderpriority, graft_bitmap_distinct(o_custkey) AS n
        |FROM bd_orders GROUP BY o_orderpriority""".stripMargin)
      .as[(String, Long)].collect().toMap
    val b = spark.sql(
      """SELECT o_orderpriority,
        |  graft_bitmap_distinct(o_custkey, 67108864) AS n
        |FROM bd_orders GROUP BY o_orderpriority""".stripMargin)
      .as[(String, Long)].collect().toMap
    val want = spark.sql(
      """SELECT o_orderpriority, COUNT(DISTINCT o_custkey) AS n
        |FROM bd_orders GROUP BY o_orderpriority""".stripMargin)
      .as[(String, Long)].collect().toMap
    assert(a === want)
    assert(b === want)
  }

  test("plan: partial + final aggregation — the merge happens map-side") {
    val physical = graft.Tables(spark, dir, "orders")
      .groupBy(col("o_orderpriority"))
      .agg(BitmapDistinct.of(col("o_custkey")).as("n"))
      .queryExecution.executedPlan.toString
    assert(physical.contains("partial_graft_bitmap_distinct"), physical)
    assert("graft_bitmap_distinct".r.findAllIn(physical).size >= 2, physical)
  }

  test("q40 on testdata matches count_distinct and is non-empty") {
    val q40 = graft.SparkEntry.queries("q40_bitmap_distinct")(spark, dir)
    val want = graft.Tables(spark, dir, "orders")
      .groupBy(col("o_orderpriority"))
      .agg(countDistinct(col("o_custkey")).as("n_custs"))
    assert(q40.as[(String, Long)].collect().toMap ===
      want.as[(String, Long)].collect().toMap)
    assert(q40.count() > 0)
  }
}
