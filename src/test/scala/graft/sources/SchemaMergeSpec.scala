package graft.sources

import graft.TestSpark
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Pins the schema-evolution contracts behind q53: `mergeSchema`
  * unions the footers across epoch directories (the late column is
  * NULL for rows whose files predate it), and — the failure mode the
  * option exists for — a merge-less read of the OLD epoch alone has
  * no such column at all, so code written against the evolved schema
  * breaks on un-merged reads instead of silently reading NULLs.
  * q53's registry hash pins the unioned relation itself against the
  * typed-NULL oracle at every SF.
  */
class SchemaMergeSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  private lazy val root: String = {
    val p = "target/test_evo"
    Seq((1L, 10.0), (2L, 20.0)).toDF("k", "v")
      .write.mode("overwrite").parquet(p + "/epoch=0")
    Seq((3L, 30.0, "x"), (4L, 40.0, "y")).toDF("k", "v", "tag")
      .write.mode("overwrite").parquet(p + "/epoch=1")
    p
  }

  test("mergeSchema unions footers: late column NULL before its epoch, populated after") {
    val df = spark.read.option("mergeSchema", "true").parquet(root)
    assert(df.columns.sorted.toSeq === Seq("epoch", "k", "tag", "v"))
    val rows = df.select("epoch", "k", "tag").collect()
      .map(r => (r.getInt(0), r.getLong(1), Option(r.getString(2))))
      .sortBy(_._2).toSeq
    assert(rows === Seq((0, 1L, None), (0, 2L, None),
      (1, 3L, Some("x")), (1, 4L, Some("y"))))
  }

  test("without the merge, the old epoch's schema simply lacks the column") {
    val old = spark.read.parquet(root + "/epoch=0")
    assert(!old.columns.contains("tag"))
  }
}
