package graft.sources

import graft.{Tables, TestSpark}
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Pins [[ZOrderedWrite]]'s file-envelope contract: z-clustered files
  * are near-square tiles of the 2-D key plane — per-file bounding
  * boxes tight in BOTH dimensions — while a 1-D sort layout over the
  * same rows bounds only its sort column. The normalized per-file
  * bounding AREA is the layout-quality number (it is what parquet
  * min/max row-group pruning integrates over for a 2-D predicate);
  * the `Duel zorder` measures the resulting scan-row prune at sf0.1.
  */
class ZOrderedWriteSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark

  private val dir = "/root/testdata/sf0.01"

  /** Mean per-file normalized envelope width of each dimension. */
  private def meanWidths(df: DataFrame, pMax: Long, sMax: Long)
      : (Double, Double) = {
    val r = df.groupBy(input_file_name())
      .agg(((max(col("l_partkey")) - min(col("l_partkey")))
              .cast("double") / pMax).as("wa"),
           ((max(col("l_suppkey")) - min(col("l_suppkey")))
              .cast("double") / sMax).as("wb"))
      .agg(avg(col("wa")), avg(col("wb"))).head()
    (r.getDouble(0), r.getDouble(1))
  }

  test("z-clustered files bound BOTH dimensions; 1-D sort leaves dim 2 unbounded") {
    val li = Tables(spark, dir, "lineitem")
      .select(col("l_orderkey"), col("l_partkey"), col("l_suppkey"))
    val r = li.agg(max(col("l_partkey")), max(col("l_suppkey"))).head()
    val (pMax, sMax) = (r.getLong(0), r.getLong(1))
    val nFiles = 64

    val zdf = ZOrderedWrite.write(spark, li,
      "l_partkey", "l_suppkey", nFiles, "target/test_zorder/z")
    val ldir = "target/test_zorder/linear"
    li.repartitionByRange(nFiles, col("l_partkey"))
      .sortWithinPartitions(col("l_partkey"))
      .write.mode("overwrite").parquet(ldir)
    val ldf = spark.read.parquet(ldir)

    // same rows, plus the queryable cluster key
    assert(zdf.count() === li.count())
    assert(zdf.columns.contains("zval"))
    assert(zdf.columns.toSet -- Set("zval") === li.columns.toSet)

    // Mean AREA cannot separate the layouts (both → 1/nFiles in the
    // ideal); what z-order buys is that EVERY dimension's envelope is
    // bounded simultaneously — the property min/max row-group pruning
    // needs for a predicate on either dim. Measured at this fixture:
    // z ≈ (0.22, 0.15) vs linear (0.015, 1.0).
    val (zA, zB) = meanWidths(zdf, pMax, sMax)
    val (_, lB) = meanWidths(ldf, pMax, sMax)
    assert(zA <= 0.5 && zB <= 0.5,
      f"z envelopes not simultaneously bounded: ($zA%.3f, $zB%.3f)")
    // dim 2 — the dimension the 1-D layout cannot bound at all —
    // must be ≥4x tighter than linear's (≈ full domain)
    assert(zB * 4 <= lB,
      f"z dim-2 envelope $zB%.3f not 4x tighter than linear $lB%.3f")
  }

  test("degenerate max=0 dim collapses to a 1-D sort; negative keys are rejected loudly") {
    import spark.implicits._
    // all-zero dim B: norm(B) ≡ 0, so zval interleaves only dim A's
    // bits — the write must succeed and order by A
    val flat = (0L until 100L).map(i => (i, 0L)).toDF("a", "b")
    val out = ZOrderedWrite.write(spark, flat, "a", "b", 4,
      "target/test_zorder/degenerate")
    assert(out.count() === 100L)
    // zval monotone in a when b is constant ⇒ per-file a-ranges are
    // disjoint, the 1-D-sort limit
    val ranges = out.groupBy(input_file_name())
      .agg(min(col("a")).as("lo"), max(col("a")).as("hi"))
      .collect().map(r => (r.getLong(1), r.getLong(2))).sortBy(_._1)
    ranges.sliding(2).foreach {
      case Array((_, hi1), (lo2, _)) => assert(hi1 < lo2,
        s"file a-ranges overlap in the degenerate layout: $ranges")
      case _ => ()
    }
    // a negative key would z-sort after every positive one (unsigned
    // interleave) — the contract is a loud reject, not silent chaos
    val neg = Seq((-1L, 5L), (3L, 7L)).toDF("a", "b")
    val ex = intercept[IllegalArgumentException] {
      ZOrderedWrite.write(spark, neg, "a", "b", 2,
        "target/test_zorder/neg")
    }
    assert(ex.getMessage.contains("negative"))
  }
}
