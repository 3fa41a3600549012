package graft.sources

import graft.TestSpark
import org.apache.spark.sql.functions.col
import org.scalatest.funsuite.AnyFunSuite

/** [[VersionedStreamSource]] — the commit log consumed as a stream,
  * pinned on inline data: exactly-once increments per commit,
  * OPTIMIZE commits invisible (dataChange=false files never
  * re-served), restart-from-checkpoint resume, the change-commit
  * refusal and its `skipChangeCommits` escape, `startingVersion`, and
  * `maxVersionsPerBatch` admission control.
  */
class VersionedStreamSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  private def ms(df: org.apache.spark.sql.DataFrame): Seq[String] = {
    val cols = df.columns.sorted.map(col)
    df.select(cols.toIndexedSeq: _*).collect()
      .map(_.toSeq.map(String.valueOf).mkString("|")).sorted.toSeq
  }

  private def chunk(lo: Int, hi: Int) = (lo until hi)
    .map(k => (k.toLong, s"n$k", k * 10.0, s"m${k % 3}"))
    .toDF("k", "name", "v", "m")

  private def del(p: String): Unit = {
    val path = new org.apache.hadoop.fs.Path(p)
    path.getFileSystem(spark.sparkContext.hadoopConfiguration)
      .delete(path, true)
  }

  private def readStreamOf(path: String, opts: (String, String)*) = {
    val r = spark.readStream.format("graft-versioned").option("path", path)
    opts.foldLeft(r) { case (b, (k, v)) => b.option(k, v) }.load()
  }

  private def runToParquet(src: org.apache.spark.sql.DataFrame,
                           outDir: String, cpDir: String): Unit = {
    val q = src.writeStream.format("parquet").option("path", outDir)
      .option("checkpointLocation", cpDir)
      .outputMode(org.apache.spark.sql.streaming.OutputMode.Append).start()
    try q.processAllAvailable() finally q.stop()
  }

  test("each commit served exactly once; the OPTIMIZE commit's files never re-served") {
    val path = "target/test_vs_base"
    VersionedTable.init(spark, path, chunk(0, 12), "m")
    VersionedTable.commitAppend(spark, path, Seq("m"), chunk(12, 24))
    VersionedTable.commitOptimize(spark, path, "m", 128L * 1024 * 1024)
    VersionedTable.commitAppend(spark, path, Seq("m"), chunk(24, 30))
    val (out, cp) = ("target/test_vs_base_out", "target/test_vs_base_cp")
    del(out); del(cp)
    runToParquet(readStreamOf(path), out, cp)
    // rows = v0 ∪ v1 ∪ v3; v2's compacted files (which hold EVERY row
    // again) contribute nothing — a fail here doubles the row count
    assert(ms(spark.read.parquet(out)) === ms(chunk(0, 30)))
  }

  test("restart from checkpoint resumes at the committed version — no replay, only the new commit") {
    val path = "target/test_vs_resume"
    VersionedTable.init(spark, path, chunk(0, 12), "m")
    VersionedTable.commitAppend(spark, path, Seq("m"), chunk(12, 18))
    val (out, cp) = ("target/test_vs_resume_out", "target/test_vs_resume_cp")
    del(out); del(cp)
    runToParquet(readStreamOf(path), out, cp)
    assert(ms(spark.read.parquet(out)) === ms(chunk(0, 18)))
    // land one more commit, restart the SAME checkpoint
    VersionedTable.commitAppend(spark, path, Seq("m"), chunk(18, 21))
    runToParquet(readStreamOf(path), out, cp)
    val after = spark.read.parquet(out)
    // exactly the new rows appended — a replay would duplicate 0..17
    assert(ms(after) === ms(chunk(0, 21)))
  }

  test("a change commit fails loudly by default; skipChangeCommits drops it whole") {
    val path = "target/test_vs_change"
    VersionedTable.init(spark, path, chunk(0, 12), "m")
    val ch = Seq((3L, "upd", 333.0, "m0", "U")).toDF("k", "name", "v", "m", "op")
    VersionedTable.commitMerge(spark, path, "m", ch, "k")
    VersionedTable.commitAppend(spark, path, Seq("m"), chunk(12, 15))
    val (out, cp) = ("target/test_vs_change_out", "target/test_vs_change_cp")
    del(out); del(cp)
    val thrown = intercept[org.apache.spark.sql.streaming.StreamingQueryException] {
      runToParquet(readStreamOf(path), out, cp)
    }
    assert(thrown.getMessage.contains("append-only") ||
      Option(thrown.getCause).exists(_.getMessage.contains("append-only")))
    // the escape hatch: the merge commit is dropped WHOLE, appends flow
    del(out); del(cp)
    runToParquet(readStreamOf(path, "skipChangeCommits" -> "true"), out, cp)
    assert(ms(spark.read.parquet(out)) === ms(chunk(0, 15)))
  }

  test("startingVersion serves only later commits") {
    val path = "target/test_vs_startv"
    VersionedTable.init(spark, path, chunk(0, 12), "m")
    VersionedTable.commitAppend(spark, path, Seq("m"), chunk(12, 18))
    VersionedTable.commitAppend(spark, path, Seq("m"), chunk(18, 24))
    val (out, cp) = ("target/test_vs_startv_out", "target/test_vs_startv_cp")
    del(out); del(cp)
    runToParquet(readStreamOf(path, "startingVersion" -> "1"), out, cp)
    assert(ms(spark.read.parquet(out)) === ms(chunk(18, 24)))
  }

  test("maxVersionsPerBatch bounds how many commits one micro-batch absorbs") {
    val path = "target/test_vs_admission"
    VersionedTable.init(spark, path, chunk(0, 6), "m")
    VersionedTable.commitAppend(spark, path, Seq("m"), chunk(6, 12))
    VersionedTable.commitAppend(spark, path, Seq("m"), chunk(12, 18))
    del("target/test_vs_admission_cp2")
    val batches = scala.collection.mutable.ArrayBuffer.empty[(Long, Long)]
    val q = readStreamOf(path, "maxVersionsPerBatch" -> "1")
      .writeStream.foreachBatch { (b: org.apache.spark.sql.DataFrame,
                                   id: Long) =>
        batches += ((id, b.count())); ()
      }.option("checkpointLocation", "target/test_vs_admission_cp2")
      .start()
    try q.processAllAvailable() finally q.stop()
    // three commits → three 6-row batches, never one 18-row gulp
    assert(batches.map(_._2).toSeq === Seq(6L, 6L, 6L), batches)
  }

  test("readChangeFeed streams row-level events — change commits become streamable") {
    val path = "target/test_vs_cdf"
    VersionedTable.init(spark, path, chunk(0, 12), "m")
    // a MERGE commit (update + delete) — the append-only mode refuses
    // this; CDF mode serves its events
    val ch = Seq(
      (3L, "upd", 333.0, "m0", "U"),
      (4L, "del", 0.0, "m1", "D")
    ).toDF("k", "name", "v", "m", "op")
    VersionedTable.commitMerge(spark, path, "m", ch, "k")
    VersionedTable.commitOptimize(spark, path, "m", 128L * 1024 * 1024)
    val (out, cp) = ("target/test_vs_cdf_out", "target/test_vs_cdf_cp")
    del(out); del(cp)
    runToParquet(readStreamOf(path,
      "readChangeFeed" -> "true", "key" -> "k"), out, cp)
    val got = spark.read.parquet(out)
    // v0's snapshot feeds as inserts at version 0
    assert(got.filter(col("change_type") === "insert" &&
      col("change_version") === 0L).count() === 12L)
    // v1's events exactly; v2's optimize contributes nothing
    assert(ms(got.filter(col("change_version") === 1L)) === ms(Seq(
      ("update_preimage", 3L, "n3", 30.0, "m0", 1L),
      ("update_postimage", 3L, "upd", 333.0, "m0", 1L),
      ("delete", 4L, "n4", 40.0, "m1", 1L)
    ).toDF("change_type", "k", "name", "v", "m", "change_version")))
    assert(got.count() === 15L)
    // restart with a fresh commit: only ITS events arrive
    VersionedTable.commitAppend(spark, path, Seq("m"), chunk(12, 14))
    runToParquet(readStreamOf(path,
      "readChangeFeed" -> "true", "key" -> "k"), out, cp)
    val after = spark.read.parquet(out)
    assert(after.count() === 17L)
    assert(after.filter(col("change_version") === 3L)
      .select("change_type").distinct().collect()
      .map(_.getString(0)).toSeq === Seq("insert"))
  }
}
