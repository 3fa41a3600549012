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
}
