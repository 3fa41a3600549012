package graft.queries

import graft.{Tables, TestSpark}
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

class CoreQueriesSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  private val sf = "/root/testdata/sf0.001"

  test("bucketized range join equals the naive range-predicate form") {
    val bucketized = CoreQueries.q29_range_join(spark, sf)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
    val ev = Tables.events(spark, sf)
    val err = ev.filter(col("event_type") === "error")
      .select(col("event_id").as("err_id"), col("user_id").as("u"),
        col("ts").as("err_ts"))
    val naive = err.join(ev, col("user_id") === col("u") &&
        col("ts") > col("err_ts") &&
        col("ts") <= col("err_ts") + expr("INTERVAL 10 MINUTES"))
      .groupBy(col("err_id"))
      .agg(count(lit(1)).as("n"),
        sum(col("value").cast("decimal(28,2)")).cast("double").as("v"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
    assert(bucketized === naive)
    assert(bucketized.nonEmpty)
  }

  test("approx_count_distinct stays within 2% of exact (oracle precondition)") {
    // q30's oracle asserts within_2pct = TRUE per group; this pins the
    // same bound directly so a sketch regression fails here first.
    val rows = CoreQueries.q30_approx_distinct(spark, sf).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      assert(r.getBoolean(2),
        s"flag=${r.getString(0)} exact=${r.getLong(1)} outside 2%")
    }
  }
}
