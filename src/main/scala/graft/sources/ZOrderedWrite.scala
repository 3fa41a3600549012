package graft.sources

import graft.functions.GraftExpressions
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** First-class z-ordered (Morton-clustered) parquet write — the layout
  * operator behind Delta/Iceberg `ZORDER BY`, promoted out of the
  * `Duel zorder` harness (r10 verdict item 5): cluster rows so that
  * files are near-square tiles of a 2-D key plane, making parquet
  * min/max row-group pruning effective for predicates on EITHER or
  * BOTH dimensions — where a 1-D sort layout bounds only its own sort
  * column.
  *
  * Mechanics (each step load-bearing):
  *  1. both dims NORMALIZE to a common 16-bit width via
  *     `floorDiv(c · 65535, max)` — bit-balance is required: with raw
  *     keys of unequal width the interleave exhausts the narrow dim's
  *     bits early and every file spans nearly its whole domain
  *     (measured 1.73× prune vs ~12× normalized — SCALE.md "z-order
  *     needs bit-balanced dims");
  *  2. `zorder(a, b)` interleaves the normalized bits (codegen'd
  *     [[graft.functions.ZOrder]], one static call per row);
  *  3. `repartitionByRange(nFiles, zval)` + `sortWithinPartitions` —
  *     range boundaries come from Spark's reservoir sample, so files
  *     are near-equal row counts regardless of key skew; at 100 TB
  *     `nFiles` is the scale dial (pick ≈ one row-group-multiple per
  *     file).
  *
  * The two dim maxima are one 2-scalar driver aggregate (the only
  * driver action; everything else is a distributed write). The
  * written schema is the input's plus `zval` — keeping the cluster
  * key queryable costs 8 bytes/row and lets audits ([[graft.queries
  * .CoreQueries.q42_zorder]] reads this layout) bucket by it without
  * recomputation. ZOrderedWriteSpec pins the file-envelope contract:
  * per-file (dimA × dimB) normalized bounding area is ≥ 4× tighter
  * than the same data 1-D-sorted; the `Duel zorder` records the
  * resulting scan-row prune at sf0.1 (~12× on a 2-D box, ~8× on a
  * dim-2-only band where 1-D prunes nothing).
  */
object ZOrderedWrite {

  /** Normalized dim width: 16 bits per dim (31 available) keeps the
    * interleave exact while bit-balancing arbitrary key domains.
    */
  val NormBits = 16
  private val NormMax = (1L << NormBits) - 1

  private def norm(c: org.apache.spark.sql.Column, mx: Long) =
    GraftExpressions.floorDiv(c * lit(NormMax), lit(math.max(mx, 1L)))

  /** Write `df` z-clustered on `(dimA, dimB)` (non-negative integral
    * columns) into `path` as `nFiles` parquet files; returns the
    * written row count's source relation re-read from disk.
    */
  def write(spark: SparkSession, df: DataFrame, dimA: String, dimB: String,
            nFiles: Int, path: String): DataFrame = {
    val r = df.agg(max(col(dimA)), max(col(dimB))).head()
    val (mxA, mxB) = (r.getLong(0), r.getLong(1))
    df.withColumn("zval", GraftExpressions.zorder(
        norm(col(dimA), mxA), norm(col(dimB), mxB)))
      .repartitionByRange(nFiles, col("zval"))
      .sortWithinPartitions(col("zval"))
      .write.mode("overwrite").parquet(path)
    spark.read.parquet(path)
  }
}
