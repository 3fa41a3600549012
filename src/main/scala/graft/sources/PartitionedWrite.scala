package graft.sources

import org.apache.spark.sql.{Column, DataFrame, SaveMode, SparkSession}
import org.apache.spark.sql.functions.col

/** Hive-style partitioned-directory layout — the third first-class
  * storage-layout operator next to [[Bucketing]] (hash co-location for
  * joins/aggs) and [[ZOrderedWrite]] (multi-dimensional row-group
  * clustering): rows are routed into one DIRECTORY per partition-column
  * value, so a predicate on that column never opens the other
  * directories at all. At 100 TB this is the single biggest scan-cost
  * lever a warehouse has — a 7-year corpus partitioned by month turns a
  * "last quarter" query from a full-corpus scan into a 3/84-directory
  * listing — and it composes with the other two: partition directories
  * prune FIRST (no file even listed), then z-ordered row groups prune
  * WITHIN the surviving files, then bucketing kills the join shuffle.
  *
  * Two pruning modes, both pinned by [[graft.sources.PartitionedSpec]]:
  *  - STATIC: a literal predicate on the partition column resolves at
  *    plan time (`PartitionFilters` on the scan, non-selected
  *    directories never listed) — [[graft.queries.CoreQueries.q47_partition_pruned]].
  *  - DYNAMIC (DPP): the predicate arrives at RUNTIME from the other
  *    side of a join — Catalyst plants a `dynamicpruningexpression`
  *    subquery on the scan, reuses the join's broadcast to evaluate it,
  *    and skips every directory whose key the dim side didn't produce —
  *    [[graft.queries.CoreQueries.q48_dpp_join]]. This is the star-join
  *    shape (fact partitioned on the dim key, selective dim filter)
  *    that static pruning can NOT express, because the surviving key
  *    set is data, not syntax.
  */
object PartitionedWrite {

  /** Write `df` + derived partition column `partCol = partExpr` as a
    * hive-partitioned parquet directory tree at `path`, and return the
    * read-back relation (schema = df's columns + `partCol`, re-typed
    * by partition-VALUE inference from the directory names — pick key
    * formats that infer stably: int keys like `yyyymm` do; `yyyy-MM`
    * strings infer back as DATE).
    *
    * `splitFiles` is the WITHIN-partition split key: at 1 (default)
    * `repartition(partCol)` routes each partition value to exactly one
    * task → one file per directory — the right shape while a
    * partition's rows fit one task AND the reader's parallelism. Past
    * either bound it is the wrong one: a pruned scan gets one task per
    * file(-split), so a ≤8-directory workload on 32 cores runs 8 wide
    * and LOSES wall despite reading 10× fewer rows (measured: q48 at
    * sf10/local[32], 3.09s pruned vs 1.67s unpruned — the r13 sf10
    * sweep's one layout inversion). At `splitFiles = n` the routing
    * key becomes (partCol, hash(row) mod n), so each directory is
    * written — and later scanned — by up to n tasks; pruning semantics
    * and row content are unchanged (the salt never reaches the data,
    * only the shuffle), file counts grow n-fold.
    */
  def partitionedTable(s: SparkSession, df: DataFrame, path: String,
                       partCol: String, partExpr: Column,
                       splitFiles: Int = 1): DataFrame = {
    val keyed = df.withColumn(partCol, partExpr)
    val routed =
      if (splitFiles <= 1) keyed.repartition(col(partCol))
      else keyed.repartition(
        // explicit partition count: a count-free repartition is AQE-
        // coalescible, and at small inputs AQE folds the whole write
        // into one task — silently undoing the split this option
        // exists to create (the salt would route, then coalesce).
        s.conf.get("spark.sql.shuffle.partitions").toInt,
        col(partCol),
        org.apache.spark.sql.functions.pmod(
          org.apache.spark.sql.functions.hash(df.columns.map(col): _*),
          org.apache.spark.sql.functions.lit(splitFiles)))
    routed.write.mode(SaveMode.Overwrite)
      .partitionBy(partCol)
      .parquet(path)
    s.read.parquet(path)
  }
}
