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
    * The `repartition(partCol)` routes each partition value to exactly
    * one task → one file per directory. That is the right shape while
    * a partition's rows fit one task (true for month-grain lineitem
    * through sf10); at larger scale add a within-partition split key
    * (e.g. `repartition(n, partCol, pmod(hash(...)))`) or
    * `maxRecordsPerFile` — the layout and pruning are unchanged, only
    * file counts grow.
    */
  def partitionedTable(s: SparkSession, df: DataFrame, path: String,
                       partCol: String, partExpr: Column): DataFrame = {
    df.withColumn(partCol, partExpr)
      .repartition(col(partCol))
      .write.mode(SaveMode.Overwrite)
      .partitionBy(partCol)
      .parquet(path)
    s.read.parquet(path)
  }
}
