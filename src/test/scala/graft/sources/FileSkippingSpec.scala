package graft.sources

import graft.TestSpark
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Pins [[graft.queries.CoreQueries.q58_file_skipping]]'s layout
  * contract: the range-clustered tree really has multiple date-tiled
  * files per month, and the per-file stats probe prunes files WITHIN
  * the window's surviving directory — the increment over q55's
  * directory grain. The values are pinned by the DuckDB oracle; the
  * rows-decoded claim by the `fileskip` duel.
  */
class FileSkippingSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  private val dir = "/root/testdata/sf0.001"

  test("per-file stats prune within the surviving directory of an intra-month window") {
    val (tree, stats) = graft.queries.CoreQueries.rangedLineitem(spark, dir)
    val statsDf = spark.read.parquet(stats)
    // the layout is multi-file per directory (range tiling, ~4/month)
    val marchFiles = statsDf.filter($"l_smonth" === 199703).count()
    assert(marchFiles >= 2, s"range layout collapsed to $marchFiles " +
      "file(s) in 1997-03 — nothing for file-grain stats to separate")
    // q58's window [1997-03-05, 1997-03-12] lives inside 1997-03
    val (lo, hi) = (to_timestamp(lit("1997-03-05")),
      to_timestamp(lit("1997-03-12")))
    val live = statsDf.filter($"max_ship" >= lo && $"min_ship" <= hi)
      .select("file").collect().map(_.getString(0)).toSeq
    assert(live.nonEmpty)
    // every surviving file is in the window's month directory...
    assert(live.forall(_.startsWith("l_smonth=199703/")),
      s"file skip leaked outside the window month: $live")
    // ...and the skip pruned files WITHIN that directory — the thing
    // directory-grain stats cannot do
    assert(live.length < marchFiles,
      s"no within-directory pruning: kept ${live.length} of $marchFiles")
    // superset safety: the skipped files hold no qualifying row
    val skipped = statsDf.filter($"l_smonth" === 199703)
      .filter(!($"max_ship" >= lo && $"min_ship" <= hi))
      .select("file").collect().map(_.getString(0)).toSeq
    val leaked = spark.read.option("basePath", tree)
      .parquet(skipped.map(f => s"$tree/$f"): _*)
      .filter($"l_shipdate" >= lo && $"l_shipdate" <= hi).count()
    assert(leaked === 0L,
      s"$leaked qualifying rows live in files the stats skipped")
  }

  test("the index plans only the intersecting files: scan numFiles < month files, relation exact") {
    import org.apache.spark.sql.execution._
    import org.apache.spark.sql.execution.adaptive._
    def scans(p: SparkPlan): Seq[FileSourceScanExec] = {
      val here = p match {
        case s: FileSourceScanExec => Seq(s); case _ => Nil
      }
      val kids = p match {
        case a: AdaptiveSparkPlanExec => Seq(a.executedPlan)
        case q: QueryStageExec => Seq(q.plan)
        case other => other.children
      }
      here ++ kids.flatMap(scans)
    }
    val q = graft.queries.CoreQueries.q58_file_skipping(spark, dir)
    val rows = q.collect()
    assert(rows.nonEmpty)
    val scan = scans(q.queryExecution.executedPlan).head
    val (tree, stats) = graft.queries.CoreQueries.rangedLineitem(spark, dir)
    val marchFiles = spark.read.parquet(stats)
      .filter($"l_smonth" === 199703).count()
    val planned = scan.metrics("numFiles").value
    assert(planned > 0 && planned < marchFiles,
      s"index planned $planned files; expected fewer than the " +
        s"$marchFiles in the window's month")
    // and the pruned plan equals the plain tree read — superset safety
    // through the index path
    val plain = spark.read.parquet(tree)
      .filter($"l_shipdate" >= to_timestamp(lit("1997-03-05")) &&
        $"l_shipdate" <= to_timestamp(lit("1997-03-12")))
      .groupBy($"l_returnflag")
      .agg(sum($"l_extendedprice".cast("decimal(28,2)")).cast("double"),
        count(lit(1)))
    assert(rows.map(_.toSeq.toString).sorted.toSeq ===
      plain.collect().map(_.toSeq.toString).sorted.toSeq)
  }

  test("the sidecar is file-complete: its rows cover exactly the tree's data files") {
    val (tree, stats) = graft.queries.CoreQueries.rangedLineitem(spark, dir)
    val inStats = spark.read.parquet(stats)
      .select("file").collect().map(_.getString(0)).toSet
    val root = new org.apache.hadoop.fs.Path(tree)
    val fs = root.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val onDisk = fs.listStatus(root).iterator
      .filter(d => d.isDirectory && d.getPath.getName.contains("="))
      .flatMap(d => fs.listStatus(d.getPath).iterator
        .filter(f => f.isFile && !f.getPath.getName.startsWith("_")
          && !f.getPath.getName.startsWith("."))
        .map(f => s"${d.getPath.getName}/${f.getPath.getName}"))
      .toSet
    assert(inStats === onDisk,
      s"sidecar/tree divergence: only-stats=${inStats -- onDisk} " +
        s"only-disk=${onDisk -- inStats}")
  }
}
