package graft.queries

import graft.Tables
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Relational operator queries covering SURVEY.md §2's inventory
  * (O1–O21), each paired with an ANSI-SQL oracle in [[oracle]].
  *
  * Numeric discipline for oracle parity: double aggregates go through
  * `decimal` so Spark and DuckDB produce bit-identical results
  * regardless of accumulation order (double sums are not associative;
  * at 32 shuffle partitions Spark's partial aggregation would differ
  * from DuckDB's sequential sum in the last ulp).
  */
object CoreQueries {

  private def t(s: SparkSession, dir: String, name: String): DataFrame =
    Tables(s, dir, name)

  /** Exact decimal sum of a 2-dp double column, surfaced as double. */
  private def dsum(c: String): org.apache.spark.sql.Column =
    sum(col(c).cast(DecimalType(28, 2))).cast(DoubleType)

  // O1+O2: parquet scan + projection/cast — pruned scan, no shuffle.
  def q01_scan_project(s: SparkSession, dir: String): DataFrame =
    t(s, dir, "lineitem")
      .select(col("l_orderkey"), col("l_partkey"),
        col("l_quantity").cast(IntegerType).as("qty_int"))

  // O3: filter/predicate — pushed to the parquet reader.
  def q02_filter(s: SparkSession, dir: String): DataFrame =
    t(s, dir, "lineitem")
      .filter(col("l_returnflag") === "R" && col("l_quantity") > 30)
      .select(col("l_orderkey"), col("l_linenumber"), col("l_quantity"))

  // O5+O6: shuffle + hash aggregation (reference reducer sum,
  // pageRank_v2.java:183,202-204). Map-side partial agg is automatic.
  def q03_groupby_sum(s: SparkSession, dir: String): DataFrame =
    t(s, dir, "lineitem")
      .groupBy(col("l_returnflag"), col("l_linestatus"))
      .agg(
        dsum("l_quantity").as("sum_qty"),
        dsum("l_extendedprice").as("sum_price"),
        count(lit(1)).as("n_rows"))

  val oracle: Map[String, String] = Map(
    "q01_scan_project" ->
      """SELECT l_orderkey, l_partkey, CAST(l_quantity AS INTEGER) AS qty_int
        |FROM lineitem""".stripMargin,
    "q02_filter" ->
      """SELECT l_orderkey, l_linenumber, l_quantity
        |FROM lineitem WHERE l_returnflag = 'R' AND l_quantity > 30""".stripMargin,
    "q03_groupby_sum" ->
      """SELECT l_returnflag, l_linestatus,
        |  CAST(SUM(CAST(l_quantity AS DECIMAL(28,2))) AS DOUBLE) AS sum_qty,
        |  CAST(SUM(CAST(l_extendedprice AS DECIMAL(28,2))) AS DOUBLE) AS sum_price,
        |  COUNT(*) AS n_rows
        |FROM lineitem GROUP BY l_returnflag, l_linestatus""".stripMargin,
  )

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q01_scan_project" -> (q01_scan_project _),
    "q02_filter" -> (q02_filter _),
    "q03_groupby_sum" -> (q03_groupby_sum _),
  )
}
