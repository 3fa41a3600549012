package graft.graph

import graft.TestSpark
import graft.sources.Bucketing
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.execution.{FileSourceScanExec, SparkPlan}
import org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec
import org.apache.spark.sql.execution.exchange.Exchange
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Executes the iterative g-family's 100 TB claim
  * ([[graft.queries.GraphQueries]] `graph_sym` scaladoc): when the
  * symmetrized edge relation is a table BUCKETED BY src, a round's
  * frontier join moves ONLY the frontier — the edge side reads
  * co-located bucket files with zero exchanges, at any executor
  * count. BucketingSpec proves the layout mechanism on a plain join;
  * this spec proves the COMPOSITION: (1) the exact per-round join
  * shape the FromSym loops plan is exchange-free on the edge side,
  * and (2) the full converged loops (CC, BFS, SSSP) run against the
  * bucketed table and return the identical result to the in-memory
  * path — layout changes the plan, never the fixpoint.
  */
class GraphBucketedSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark

  private val dir = "/root/testdata/sf0.001"

  /** AdaptiveSparkPlanExec and the per-stage QueryStageExec wrappers
    * are leaves to collect(); recurse into their inner plans.
    */
  private def flatten(p: SparkPlan): Seq[SparkPlan] = p match {
    case a: AdaptiveSparkPlanExec => flatten(a.executedPlan)
    case q: org.apache.spark.sql.execution.adaptive.QueryStageExec =>
      q +: flatten(q.plan)
    case other => other +: other.children.flatMap(flatten)
  }

  private def symDf: DataFrame = {
    val e = graft.queries.GraphQueries.derivedEdges(spark, dir)
    e.union(e.select(col("dst"), col("src"))).toDF("src", "dst").distinct()
  }

  private def withNoBroadcast[A](f: => A): A = {
    // at sf0.001 AQE would broadcast the frontier (also exchange-free
    // on the edge side, but the wrong evidence: broadcast stops being
    // available exactly when the frontier outgrows the driver — the
    // regime the bucketed layout exists for). Disable it to see the
    // at-scale plan.
    val key = "spark.sql.autoBroadcastJoinThreshold"
    val prev = spark.conf.get(key)
    spark.conf.set(key, "-1")
    try f finally spark.conf.set(key, prev)
  }

  test("a round's frontier join over the bucketed sym table plans zero exchanges on the edge side") {
    val bsym = Bucketing.bucketedTable(spark, symDf, "b_graph_sym", 8, "src")
    try withNoBroadcast {
      // the exact join+agg shape every FromSym round plans: labels
      // flow u→v across the edges, v takes the min. The label
      // iterate comes from OUTSIDE the bucketed table (mid-loop it is
      // a checkpointed prior round with the aggregate's partitioning,
      // not the table's), so its side genuinely has to move.
      val lab = symDf.select(col("src").as("node")).distinct()
        .select(col("node"), col("node").as("label"))
      val round = bsym.toDF("u", "v")
        .join(lab.select(col("node").as("u"), col("label").as("l")), Seq("u"))
        .groupBy(col("v").as("node")).agg(min(col("l")).as("nbr"))
      round.collect() // settle AQE so executedPlan is final
      val flat = flatten(round.queryExecution.executedPlan)
      val exchanges = flat.collect { case e: Exchange => e }
      // the join must be a real shuffled join, not a broadcast
      assert(!flat.exists(_.nodeName.contains("Broadcast")),
        s"join broadcast despite threshold -1:\n${round.queryExecution.executedPlan}")
      assert(exchanges.nonEmpty, "expected the frontier side to shuffle")
      // the load-bearing pin: on the JOIN's edge side there is no
      // exchange between the join and the bucketed scan — the edge
      // table feeds the join in place. (Exchanges ABOVE the join — the
      // frontier side, the post-join aggregate — are exactly the
      // frontier-sized traffic the layout leaves behind.)
      def hasBucketScan(p: SparkPlan): Boolean = flatten(p).exists {
        case f: FileSourceScanExec =>
          f.tableIdentifier.exists(_.table == "b_graph_sym")
        case _ => false
      }
      val joins = flat.filter(_.nodeName.contains("Join"))
      assert(joins.nonEmpty, "no join in the round plan")
      joins.foreach { j =>
        val edgeSides = j.children.filter(hasBucketScan)
        assert(edgeSides.nonEmpty, "join has no bucketed edge side")
        edgeSides.foreach { side =>
          val shuffled = flatten(side).collect { case e: Exchange => e }
          assert(shuffled.isEmpty,
            s"bucketed edge side shuffled:\n${round.queryExecution.executedPlan}")
        }
      }
      // and the edge side really is a bucketed scan feeding the join
      val scans = flat.collect {
        case f: FileSourceScanExec
            if f.tableIdentifier.exists(_.table == "b_graph_sym") => f
      }
      assert(scans.nonEmpty, "no bucketed scan in the plan")
      assert(scans.forall(_.bucketedScan), "scan did not use the bucket layout")
    } finally spark.sql("DROP TABLE IF EXISTS b_graph_sym")
  }

  test("converged CC/BFS/SSSP over the bucketed table equal the in-memory path") {
    val sym = symDf.persist()
    val bsym = Bucketing.bucketedTable(spark, symDf, "b_graph_sym2", 8, "src")
    try withNoBroadcast {
      def sorted(df: DataFrame) = df.collect().map(_.toSeq).sortBy(_.toString)

      val ccPlain = GraphOps.connectedComponentsFromSym(sym)
      val ccBuck = GraphOps.connectedComponentsFromSym(bsym)
      assert(sorted(ccBuck) === sorted(ccPlain))

      val source = sym.agg(min(col("src"))).head().getLong(0)
      val bfsPlain = GraphOps.bfsFromSym(sym, source)
      val bfsBuck = GraphOps.bfsFromSym(bsym, source)
      assert(sorted(bfsBuck) === sorted(bfsPlain))

      def weighted(df: DataFrame) = df.select(col("src"), col("dst"),
        (lit(1L) + (col("src") + col("dst")) % 9L).as("w"))
      val ssspPlain = GraphOps.ssspFromSym(weighted(sym), source)
      val ssspBuck = GraphOps.ssspFromSym(weighted(bsym), source)
      assert(sorted(ssspBuck) === sorted(ssspPlain))

      Seq(ccPlain, ccBuck, bfsPlain, bfsBuck, ssspPlain, ssspBuck).foreach(
        org.apache.spark.sql.graft.ColumnBridge.releaseCheckpoint)
    } finally {
      sym.unpersist()
      spark.sql("DROP TABLE IF EXISTS b_graph_sym2")
    }
  }
}
