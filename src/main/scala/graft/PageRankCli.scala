package graft

import graft.graph.{GraphIO, PageRank}
import org.apache.spark.sql.SparkSession

/** End-to-end CLI driver — the Spark rebuild of the reference's real
  * entry point (`hadoop jar … prJava.PageRank_v2 <in> <out> <k>
  * <iters>`, pageRank_v2.java:45-54, Makefile:47-48,131):
  *
  * {{{
  * sbt "runMain graft.PageRankCli <in> <out> <k> <iters> [danglingMass]"
  * }}}
  *
  *  - `<in>` is either a raw edge CSV (`src,dst` per line) or a prior
  *    run's compat-state dir (`node,U,contrib,adj-` rows) — dispatched
  *    by field count exactly like the reference mapper
  *    (pageRank_v2.java:118). State input resumes the iteration; the
  *    optional `danglingMass` arg re-injects the mass the previous run
  *    reported (the reference threaded it as a Hadoop counter between
  *    jobs, pageRank_v2.java:79,83,94 — here it's a plain double, no
  *    fixed-point encoding and none of the reference's decode bug,
  *    SURVEY.md §0.2.4).
  *  - Every completed pass writes its state to `<out><pass>`
  *    (per-iteration output dirs, pageRank_v2.java:96-98) and logs the
  *    pass's dangling mass plus its reference counter encoding
  *    ⌈D·10⁸⌉ (pageRank_v2.java:218-222).
  *  - `<iters>` is the number of passes THIS invocation runs (edge
  *    input: pass 1 is the 1/N init pass); the final line on stdout is
  *    one JSON object with the closing dangling mass, which feeds the
  *    next resume.
  */
object PageRankCli {

  private val Usage =
    "Usage: graft.PageRankCli <edges.csv|state-dir> <out> <k> <iters> [danglingMass]"

  def main(args: Array[String]): Unit = {
    if (args.length < 4 || args.length > 5) {
      // reference arg check (pageRank_v2.java:47-51)
      System.err.println(Usage)
      sys.exit(2)
    }
    val in = args(0)
    val out = args(1)
    val k = args(2).toLong
    val iters = args(3).toInt
    val mass0 = if (args.length == 5) args(4).toDouble else 0.0
    require(k > 0, "k must be positive")
    require(iters >= 1, "iters must be >= 1")

    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val spark = SparkSession.builder()
      .master(sys.props.getOrElse("spark.master", s"local[$cpus]"))
      .appName("graft-pagerank")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled",
        sys.props.getOrElse("spark.ui.enabled", "false"))
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    val onPass = (pass: Int, st: PageRank.CompatState) => {
      GraphIO.writeCompatCsv(st.state, out + pass)
      // the reference's per-iteration mass log (pageRank_v2.java:84)
      System.err.println(
        s"[pagerank] pass=$pass out=$out$pass " +
          s"danglingMass=${st.danglingMass} counter=${st.counterValue}")
    }

    val fin =
      if (GraphIO.looksLikeCompatState(spark, in))
        PageRank.compatSteps(
          PageRank.CompatState(GraphIO.readCompatCsv(spark, in), mass0),
          k, iters, onPass = onPass)
      else
        PageRank.compat(GraphIO.readEdgesCsv(spark, in), k, iters,
          onPass = onPass)

    println(s"""{"passes":$iters,"danglingMass":${fin.danglingMass},"counter":${fin.counterValue}}""")
    spark.stop()
  }
}
