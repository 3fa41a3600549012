package graft.graph

import org.apache.spark.graphx.{Edge, Graph, PartitionStrategy, VertexId}
import org.apache.spark.rdd.RDD
import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.apache.spark.storage.StorageLevel

/** GraphX flagship path for iterative PageRank (SURVEY.md §7.1.1,
  * BASELINE.json spark_approach).
  *
  * Implemented with `aggregateMessages` + an explicit driver loop
  * rather than `graphx.lib.PageRank`, because the reference's
  * semantics need dangling-mass redistribution every iteration
  * (GraphX's stock implementation leaks dangling mass) and compat mode
  * needs the no-out-degree-division contribution rule
  * (pageRank_v2.java:136-139).
  *
  * Scale: vertices/edges are partitioned by GraphX
  * (`EdgePartition2D` keeps replication ≤ 2√P at P partitions);
  * per-iteration work is one `aggregateMessages` (edge-local, no
  * driver data) plus one scalar dangling-sum action.
  */
object PageRankGraphX {

  /** Build a GraphX graph from an (src, dst) edge DataFrame. */
  def fromEdges(edges: DataFrame): Graph[Double, Unit] = {
    val edgeRdd: RDD[Edge[Unit]] = edges
      .select("src", "dst").rdd
      .map(r => Edge(r.getLong(0), r.getLong(1), ()))
    Graph.fromEdges(edgeRdd, defaultValue = 0.0,
        edgeStorageLevel = StorageLevel.MEMORY_AND_DISK,
        vertexStorageLevel = StorageLevel.MEMORY_AND_DISK)
      .partitionBy(PartitionStrategy.EdgePartition2D)
  }

  /** Standard PageRank with dangling redistribution; returns
    * (node, rank) as a DataFrame for parity with [[PageRank.standard]].
    */
  def standard(edges: DataFrame, iters: Int, beta: Double = 0.15): DataFrame = {
    val spark = edges.sparkSession
    val graph0 = fromEdges(edges)
    val n = graph0.numVertices.toDouble
    // out-degree as vertex attribute; 0 for dangling
    val degrees = graph0.outDegrees
    var g: Graph[(Double, Int), Unit] = graph0
      .outerJoinVertices(degrees)((_, _, deg) => (1.0 / n, deg.getOrElse(0)))
      .cache()

    // The dangling-sum action at the top of each pass materializes the
    // current (cached) graph, so the PREVIOUS pass's cache can be
    // dropped right after it — no extra count() job per pass.
    var prev: Graph[(Double, Int), Unit] = null
    var i = 0
    while (i < iters) {
      val d = g.vertices.filter { case (_, (_, deg)) => deg == 0 }
        .map(_._2._1).fold(0.0)(_ + _)
      if (prev != null) {
        prev.unpersistVertices(false)
        prev.edges.unpersist(false)
      }
      val contribs = g.aggregateMessages[Double](
        ctx => ctx.sendToDst(ctx.srcAttr._1 / ctx.srcAttr._2),
        _ + _)
      prev = g
      g = g.outerJoinVertices(contribs) { (_, attr, c) =>
        (beta / n + (1 - beta) * (c.getOrElse(0.0) + d / n), attr._2)
      }.cache()
      i += 1
    }
    spark.createDataFrame(
      g.vertices.map { case (id, (rank, _)) => Row(id, rank) },
      org.apache.spark.sql.types.StructType(Seq(
        org.apache.spark.sql.types.StructField("node",
          org.apache.spark.sql.types.LongType, nullable = false),
        org.apache.spark.sql.types.StructField("rank",
          org.apache.spark.sql.types.DoubleType, nullable = false))))
  }
}
