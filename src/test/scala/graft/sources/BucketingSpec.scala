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

  test("the curation composition is exchange-free over bucketed stage outputs") {
    // SCALE.md's pipeline claim, machine-checked: persist the three
    // p01 stage outputs bucketed on doc_id and the composed curation
    // (two joins + gates) plans ZERO exchanges — at 100 TB the
    // pipeline pays each stage's shuffle once at write time, then
    // every downstream composition is free of them.
    import graft.queries.{DedupQueries, PipelineQueries, TextQueries}
    Bucketing.writeBucketed(
      TextQueries.t03_langid(spark, dir).select(col("doc_id"), col("pred_lang")),
      "b_lang", 8, "doc_id")
    Bucketing.writeBucketed(
      TextQueries.t04_quality(spark, dir), "b_quality", 8, "doc_id")
    Bucketing.writeBucketed(
      DedupQueries.d06_neardup_clusters(spark, dir)
        .filter(col("is_keeper")).select(col("doc_id")),
      "b_keepers", 8, "doc_id")
    val prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try {
      val composed = spark.table("b_quality")
        .join(spark.table("b_lang"), Seq("doc_id"))
        .join(spark.table("b_keepers"), Seq("doc_id"), "left_semi")
        .filter(col("pred_lang") === "en" &&
          col("n_tokens") >= 30L &&
          col("stop_ratio") >= 0.01 && col("stop_ratio") <= 0.15 &&
          col("digit_ratio") <= 0.2 && col("mean_tok_len") <= 5.0)
      val p = finalPlan(composed)
      assert(!p.contains("Exchange"), s"bucketed curation shuffled:\n$p")
      // same rows as the live composition
      assert(composed.count() ===
        PipelineQueries.p01_curate(spark, dir).count())
    } finally {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
      Seq("b_lang", "b_quality", "b_keepers")
        .foreach(t => spark.sql(s"DROP TABLE IF EXISTS $t"))
    }
  }
}
