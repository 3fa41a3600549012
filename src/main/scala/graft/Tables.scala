package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Parquet test-table loader (TESTDATA.md layout: one parquet file per
  * table under an sf directory). Reads go through `spark.read.parquet`
  * so Catalyst pushes filters/projections into the scan — at 100 TB the
  * same call pattern prunes row groups and columns server-side.
  */
object Tables {
  val names: Seq[String] = Seq(
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings")

  def apply(spark: SparkSession, sfDir: String, name: String): DataFrame =
    spark.read.parquet(s"$sfDir/$name.parquet")

  /** `events` with its TIMESTAMP(NANOS) column usable: Spark 4 refuses
    * nanosecond parquet timestamps unless
    * `spark.sql.legacy.parquet.nanosAsLong=true` (set in every session
    * builder here), which surfaces `ts` as LONG nanos-since-epoch. This
    * loader converts to a proper µs TimestampType column (the testdata
    * carries no sub-µs precision, so the integer division is lossless).
    */
  def events(spark: SparkSession, sfDir: String): DataFrame = {
    import org.apache.spark.sql.functions._
    apply(spark, sfDir, "events")
      .withColumn("ts", timestamp_micros(expr("ts div 1000")))
  }
}
