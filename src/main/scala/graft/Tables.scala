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

  /** `events` with `ts` normalised to a µs TimestampType column regardless
    * of how the parquet file encodes it. The testdata has shipped two
    * encodings across rounds — TIMESTAMP(NANOS) (surfaced as LONG nanos
    * under `spark.sql.legacy.parquet.nanosAsLong=true`, set in every
    * session builder here) and TIMESTAMP(µs) (surfaced as TimestampNTZ or
    * Timestamp depending on inference) — so this loader branches on the
    * dtype it actually got instead of hard-coding one. Sessions run UTC,
    * so the NTZ→instant cast is value-preserving and downstream queries
    * (windows, as-of joins, range frames) keep seeing the TimestampType
    * they were written against.
    */
  def events(spark: SparkSession, sfDir: String): DataFrame = {
    import org.apache.spark.sql.functions._
    import org.apache.spark.sql.types._
    val raw = apply(spark, sfDir, "events")
    raw.schema("ts").dataType match {
      case LongType         => raw.withColumn("ts", timestamp_micros(expr("ts div 1000")))
      case TimestampNTZType => raw.withColumn("ts", col("ts").cast(TimestampType))
      case TimestampType    => raw
      case other => throw new IllegalStateException(
        s"events.ts loaded as unsupported type $other (expected LONG nanos, TIMESTAMP, or TIMESTAMP_NTZ)")
    }
  }
}
