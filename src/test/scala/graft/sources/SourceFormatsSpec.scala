package graft.sources

import graft.TestSpark
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Source/sink format coverage beyond the driver's parquet and the
  * reference's text/CSV: ORC and JSON-lines roundtrips must preserve
  * the documents table exactly, and ORC must accept predicate
  * pushdown like parquet does (the scan property SCALE.md's pruning
  * claims rest on, format-independent).
  */
class SourceFormatsSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark

  private val dir = "/root/testdata/sf0.001"

  private def docs = graft.Tables(spark, dir, "documents")

  private def asSet(df: org.apache.spark.sql.DataFrame) =
    df.select("doc_id", "text", "lang", "source", "n_chars").collect()
      .map(r => (r.getLong(0), r.getString(1), r.getString(2),
        r.getString(3), r.getLong(4))).toSet

  test("ORC roundtrip preserves the documents table exactly") {
    val tmp = java.nio.file.Files.createTempDirectory("orc").toString
    docs.write.mode("overwrite").orc(s"$tmp/documents.orc")
    val back = spark.read.orc(s"$tmp/documents.orc")
    assert(asSet(back) === asSet(docs))
    // pushdown reaches the ORC scan, same as parquet
    val p = back.filter(col("lang") === "en")
      .queryExecution.executedPlan.toString
    assert(p.contains("PushedFilters: ["), p)
    assert(!p.contains("PushedFilters: []"), "no filters reached the ORC scan")
  }

  test("JSON-lines roundtrip preserves the documents table exactly") {
    val tmp = java.nio.file.Files.createTempDirectory("jsonl").toString
    docs.write.mode("overwrite").json(s"$tmp/documents.jsonl")
    // explicit schema: JSONL carries no types, and schema inference on
    // a 100 TB corpus is a full extra pass — production always pins it
    val back = spark.read.schema(docs.schema).json(s"$tmp/documents.jsonl")
    assert(asSet(back) === asSet(docs))
  }
}
