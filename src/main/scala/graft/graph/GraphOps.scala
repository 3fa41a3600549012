package graft.graph

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Primitive graph operators from the reference's inventory
  * (SURVEY.md §2): adjacency build (O7), transpose (O16), degrees
  * (O17), structural predicates (O3), explode (O4).
  *
  * All operators are narrow projections or single-shuffle aggregates;
  * at scale the shuffle key is always the node id, so downstream
  * node-keyed joins reuse the same hash partitioning (no second
  * exchange when partition counts line up).
  */
object GraphOps {

  /** Adjacency list: src → deduped, sorted out-neighbors.
    * Reference packs this as a `-`-joined string through a HashSet
    * (pageRank_v2.java:122,184,207-213); here it is a first-class
    * ARRAY<LONG>. `sort_array` makes output deterministic (HashSet
    * order was not).
    */
  def adjacency(edges: DataFrame): DataFrame =
    edges.groupBy(col("src").as("node"))
      .agg(sort_array(collect_set(col("dst"))).as("adj"))

  /** Graph transpose — the incoming-links view (pageRank.java:134-144). */
  def transpose(edges: DataFrame): DataFrame =
    edges.select(col("dst").as("src"), col("src").as("dst"))

  /** Out-degree per source node (v1's TotalRecordsReducer analogue,
    * pageRank.java:146-158, generalized per-key).
    */
  def outDegrees(edges: DataFrame): DataFrame =
    edges.groupBy(col("src").as("node")).agg(count(lit(1)).as("out_degree"))

  def inDegrees(edges: DataFrame): DataFrame =
    edges.groupBy(col("dst").as("node")).agg(count(lit(1)).as("in_degree"))

  /** Every distinct node id appearing as src or dst. */
  def nodes(edges: DataFrame): DataFrame =
    edges.select(col("src").as("node"))
      .union(edges.select(col("dst").as("node"))).distinct()

  /** Nodes with no outgoing edges (the true dangling set; the
    * reference hardcodes node 0, pageRank_v2.java:35,216).
    */
  def danglingNodes(edges: DataFrame): DataFrame =
    nodes(edges).join(
      edges.select(col("src").as("node")).distinct(),
      Seq("node"), "left_anti")

  /** Chain-head predicate `node % k == 1` (pageRank_v2.java:145,165). */
  def isChainHead(k: Long) = (col("node") % k) === 1

  /** Explode an adjacency state back to an edge list (O4 inverse of O7). */
  def explodeAdjacency(adj: DataFrame): DataFrame =
    adj.select(col("node").as("src"), explode(col("adj")).as("dst"))
}
