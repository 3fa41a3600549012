package graft

import org.apache.spark.sql.{SparkSession, DataFrame}

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  *
  * `queries` is the union of every operator module's registry; each key
  * has a matching DuckDB oracle in `oracleSql` (or a deliberate omission
  * for non-SQL-expressible operators → rows-only check).
  */
object SparkEntry {

  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0.
    * Iterative PageRank over the orders-derived graph — the reference's
    * core computation (SURVEY.md §0.1) on the driver's testdata.
    */
  def entry(spark: SparkSession): DataFrame =
    queries("g04_pagerank")(spark, "/root/testdata/sf0.001")

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] =
    graft.queries.CoreQueries.queries ++
      graft.queries.GraphQueries.queries ++
      graft.queries.TextQueries.queries ++
      graft.queries.DedupQueries.queries ++
      graft.queries.SimilarityQueries.queries ++
      graft.queries.MultimodalQueries.queries ++
      graft.queries.StreamQueries.queries ++
      graft.queries.PipelineQueries.queries

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omit for non-SQL-expressible ops. */
  def oracleSql: Map[String, String] =
    graft.queries.CoreQueries.oracle ++
      graft.queries.GraphQueries.oracle ++
      graft.queries.TextQueries.oracle ++
      graft.queries.DedupQueries.oracle ++
      graft.queries.SimilarityQueries.oracle ++
      graft.queries.MultimodalQueries.oracle ++
      graft.queries.StreamQueries.oracle ++
      graft.queries.PipelineQueries.oracle
}
