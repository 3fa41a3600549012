package graft.queries
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
object D16Merge {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", 64)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val t0 = System.nanoTime()
    val out = spark.read.parquet(
        (0 until 16).map(i => s"target/d16_shards_16_517594dd/shard_$i"): _*)
      .groupBy(col("doc_a"), col("doc_b"))
      .agg(sum(col("c")).as("c"), max(col("na")).as("na"), max(col("nb")).as("nb"))
      .select(col("doc_a"), col("doc_b"), col("c"), col("na"), col("nb"),
        (col("c").cast("double") / least(col("na"), col("nb")).cast("double")).as("containment"))
      .filter(col("containment") >= 0.9)
    val n = out.count()
    println(f"D16MERGE rows=$n sec=${(System.nanoTime()-t0)/1e9}%.1f")
    val totPairs = spark.read.parquet(
      (0 until 16).map(i => s"target/d16_shards_16_517594dd/shard_$i"): _*).count()
    println(s"D16MERGE shard_rows=$totPairs")
    spark.stop()
  }
}
