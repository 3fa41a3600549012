package graft.sources

import graft.TestSpark
import org.apache.spark.sql.functions.col
import org.scalatest.funsuite.AnyFunSuite

/** [[VersionedTable.changeFeed]] — row-level CDC read off the commit
  * log, pinned on inline data: event classification (insert / delete
  * / update pre+post images), carried-row exclusion (a rewritten
  * directory's unchanged rows emit nothing), the `dataChange=false`
  * skip across OPTIMIZE commits (and its equivalence to the diff it
  * avoids), multi-step union with per-commit `change_version`, and
  * feed semantics across a schema evolution (pre-evolution images
  * serve typed nulls for late columns).
  */
class VersionedChangeFeedSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  private def ms(df: org.apache.spark.sql.DataFrame): Seq[String] = {
    val cols = df.columns.sorted.map(col)
    df.select(cols.toIndexedSeq: _*).collect()
      .map(_.toSeq.map(String.valueOf).mkString("|")).sorted.toSeq
  }

  // 12 rows over 3 months; keys 0..11, month m{k%3}
  private def base = (0L until 12L)
    .map(k => (k, s"n$k", k * 10.0, s"m${k % 3}"))
    .toDF("k", "name", "v", "m")

  private def build(path: String): String = {
    VersionedTable.init(spark, path, base, "m")
    // v1: update k=3 (m0), delete k=4 (m1), insert k=100 into m2 —
    // m0/m1/m2 ALL rewritten, so carried rows in every directory
    val ch1 = Seq(
      (3L, "upd", 333.0, "m0", "U"),
      (4L, "del", 0.0, "m1", "D"),
      (100L, "ins", 1.0, "m2", "I")
    ).toDF("k", "name", "v", "m", "op")
    VersionedTable.commitMerge(spark, path, "m", ch1, "k")
    // v2: OPTIMIZE — pure rewrite, flagged dataChange=false
    VersionedTable.commitOptimize(spark, path, "m", 128L * 1024 * 1024)
    // v3: second merge — update the k=100 row inserted in v1
    val ch2 = Seq((100L, "ins2", 2.0, "m2", "U"))
      .toDF("k", "name", "v", "m", "op")
    VersionedTable.commitMerge(spark, path, "m", ch2, "k")
    path
  }

  test("single-step feed classifies insert/delete/update and excludes carried rows") {
    val path = build("target/test_vt_cdf")
    val feed = VersionedTable.changeFeed(spark, path, 0L, 1L, "k")
    val exp = Seq(
      ("delete", 4L, "n4", 40.0, "m1", 1L),
      ("insert", 100L, "ins", 1.0, "m2", 1L),
      ("update_preimage", 3L, "n3", 30.0, "m0", 1L),
      ("update_postimage", 3L, "upd", 333.0, "m0", 1L)
    ).toDF("change_type", "k", "name", "v", "m", "change_version")
    assert(ms(feed) === ms(exp))
  }

  test("an OPTIMIZE commit is flagged dataChange=false, skipped, and genuinely row-empty") {
    val path = "target/test_vt_cdf2"
    build(path)
    assert(!VersionedTable.dataChangeOf(spark, path, 2L))
    assert(VersionedTable.dataChangeOf(spark, path, 1L))
    // the production path: empty without reading data
    assert(VersionedTable.changeFeed(spark, path, 1L, 2L, "k").count() === 0L)
    // and the diff it skipped agrees — every rewritten row carried
    assert(VersionedTable.diffFeed(spark, path, 1L, 2L, "k").count() === 0L)
  }

  test("multi-step feed is the per-commit union with change_version, across the optimize") {
    val path = "target/test_vt_cdf3"
    build(path)
    val feed = VersionedTable.changeFeed(spark, path, 0L, 3L, "k")
    // v1's four events + v3's update pair; v2 contributes nothing
    assert(feed.count() === 6L)
    assert(ms(feed.filter(col("change_version") === 3L)) === ms(Seq(
      ("update_preimage", 100L, "ins", 1.0, "m2", 3L),
      ("update_postimage", 100L, "ins2", 2.0, "m2", 3L)
    ).toDF("change_type", "k", "name", "v", "m", "change_version")))
    // the same key changed in two commits appears once per commit —
    // the property that makes deltas telescope
    assert(feed.filter(col("k") === 100L).count() === 3L)
  }

  test("feed across a schema evolution serves the head schema; pre-evolution images null-widen") {
    val path = "target/test_vt_cdf_evo"
    VersionedTable.init(spark, path, base, "m")
    val ch = Seq((3L, "upd", 333.0, "m0", "gold", "U"))
      .toDF("k", "name", "v", "m", "tier", "op")
    VersionedTable.commitMerge(spark, path, "m", ch, "k",
      evolveSchema = true)
    val feed = VersionedTable.changeFeed(spark, path, 0L, 1L, "k")
    assert(feed.columns.contains("tier"))
    assert(ms(feed) === ms(Seq(
      ("update_preimage", 3L, "n3", 30.0, "m0", null.asInstanceOf[String], 1L),
      ("update_postimage", 3L, "upd", 333.0, "m0", "gold", 1L)
    ).toDF("change_type", "k", "name", "v", "m", "tier", "change_version")))
  }

  test("a full-directory delete feeds every row of the dropped directory as deletes") {
    val path = "target/test_vt_cdf_fulldel"
    VersionedTable.init(spark, path, base, "m")
    // delete all four m1 rows (k = 1, 4, 7, 10)
    val ch = Seq(1L, 4L, 7L, 10L)
      .map(k => (k, "", 0.0, "m1", "D"))
      .toDF("k", "name", "v", "m", "op")
    VersionedTable.commitMerge(spark, path, "m", ch, "k")
    val feed = VersionedTable.changeFeed(spark, path, 0L, 1L, "k")
    assert(feed.filter(col("change_type") =!= "delete").count() === 0L)
    assert(feed.select("k").as[Long].collect().sorted.toSeq ===
      Seq(1L, 4L, 7L, 10L))
  }
}
