package graft.sources

import graft.{Tables, TestSpark}
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Pins the bucketed-layout contract [[Bucketing]] documents: keyed
  * ops over co-bucketed tables run with ZERO shuffle exchanges — the
  * plan shape that makes repeated fact⋈fact joins viable at 100 TB.
  */
class BucketingSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark

  private val dir = "/root/testdata/sf0.001"

  private def finalPlan(df: org.apache.spark.sql.DataFrame): String = {
    df.collect() // settle AQE so executedPlan is the final plan
    df.queryExecution.executedPlan.toString
  }

  test("co-bucketed join and keyed agg run with zero shuffle exchanges") {
    Bucketing.writeBucketed(
      Tables(spark, dir, "orders")
        .select(col("o_orderkey"), col("o_custkey"), col("o_totalprice")),
      "b_orders", 8, "o_custkey")
    Bucketing.writeBucketed(
      Tables(spark, dir, "customer")
        .select(col("c_custkey"), col("c_name")),
      "b_customer", 8, "c_custkey")

    val prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try {
      val j = spark.table("b_orders").join(spark.table("b_customer"),
        col("o_custkey") === col("c_custkey"))
      val jPlan = finalPlan(j)
      assert(jPlan.contains("SortMergeJoin"), jPlan)
      assert(!jPlan.contains("Exchange"), s"bucketed join shuffled:\n$jPlan")

      // same join through the raw parquet relations DOES exchange —
      // the assertion above is the layout's doing, not a quirk
      val raw = Tables(spark, dir, "orders").join(
        Tables(spark, dir, "customer"),
        col("o_custkey") === col("c_custkey"))
      assert(finalPlan(raw).contains("Exchange"))
      assert(j.count() === raw.count())

      val agg = spark.table("b_orders").groupBy(col("o_custkey"))
        .agg(sum(col("o_totalprice")).as("total"))
      val aPlan = finalPlan(agg)
      assert(!aPlan.contains("Exchange"), s"bucketed agg shuffled:\n$aPlan")
      assert(agg.count() ===
        Tables(spark, dir, "orders").select("o_custkey").distinct().count())
    } finally {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
      spark.sql("DROP TABLE IF EXISTS b_orders")
      spark.sql("DROP TABLE IF EXISTS b_customer")
    }
  }
}
