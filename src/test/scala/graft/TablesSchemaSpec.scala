package graft

import org.apache.spark.sql.types._
import org.scalatest.funsuite.AnyFunSuite

/** Pins the post-load dtype of every `Tables` loader against the live
  * testdata. The point (VERDICT r9 item 5): when the driver regenerates
  * `/root/testdata` with a different parquet encoding — as happened when
  * `events.ts` flipped TIMESTAMP(NANOS)→TIMESTAMP(µs) and silently broke
  * seven queries and five scattered plan specs — the drift should fail
  * exactly one named test that says what changed, not a pile of
  * analysis errors three suites away.
  */
class TablesSchemaSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  private val sfDir = "/root/testdata/sf0.001"

  private def pin(table: String, expect: (String, DataType)*): Unit = {
    val got = Tables(spark, sfDir, table).schema.map(f => f.name -> f.dataType)
    assert(got == expect.toSeq,
      s"$table post-load schema drifted; update the consumers (and this pin) deliberately")
  }

  test("region/nation dims") {
    pin("region", "r_regionkey" -> IntegerType, "r_name" -> StringType)
    pin("nation", "n_nationkey" -> IntegerType, "n_name" -> StringType,
      "n_regionkey" -> IntegerType)
  }

  test("customer/supplier/part dims") {
    pin("customer", "c_custkey" -> LongType, "c_name" -> StringType,
      "c_nationkey" -> IntegerType, "c_acctbal" -> DoubleType,
      "c_mktsegment" -> StringType)
    pin("supplier", "s_suppkey" -> LongType, "s_name" -> StringType,
      "s_nationkey" -> IntegerType, "s_acctbal" -> DoubleType)
    pin("part", "p_partkey" -> LongType, "p_name" -> StringType,
      "p_brand" -> StringType, "p_type" -> StringType,
      "p_size" -> IntegerType, "p_retailprice" -> DoubleType)
  }

  test("orders/lineitem facts (timestamp encoding pinned)") {
    val oDate = Tables(spark, sfDir, "orders").schema("o_orderdate").dataType
    val lDate = Tables(spark, sfDir, "lineitem").schema("l_shipdate").dataType
    val tsLike = Set[DataType](TimestampType, TimestampNTZType)
    assert(tsLike(oDate), s"o_orderdate loaded as $oDate, expected a timestamp type")
    assert(tsLike(lDate), s"l_shipdate loaded as $lDate, expected a timestamp type")
    assert(Tables(spark, sfDir, "orders").schema.map(_.name) ==
      Seq("o_orderkey", "o_custkey", "o_orderstatus", "o_totalprice",
        "o_orderdate", "o_orderpriority"))
    assert(Tables(spark, sfDir, "lineitem").schema.map(_.name) ==
      Seq("l_orderkey", "l_partkey", "l_suppkey", "l_linenumber",
        "l_quantity", "l_extendedprice", "l_discount", "l_tax",
        "l_returnflag", "l_linestatus", "l_shipdate"))
  }

  test("events: raw ts is one of the supported encodings") {
    val raw = Tables(spark, sfDir, "events").schema("ts").dataType
    assert(Set[DataType](LongType, TimestampType, TimestampNTZType)(raw),
      s"events.ts raw encoding $raw is outside what Tables.events normalises; " +
        "extend the loader before anything else breaks")
  }

  test("events: normalised loader always yields TimestampType ts") {
    val ev = Tables.events(spark, sfDir)
    assert(ev.schema.map(f => f.name -> f.dataType) == Seq(
      "event_id" -> LongType, "ts" -> TimestampType, "user_id" -> LongType,
      "event_type" -> StringType, "value" -> DoubleType, "props" -> StringType))
  }

  test("events loader adapts to a synthetic nanos-as-long encoding (the r9 flip, reversed)") {
    import spark.implicits._
    import org.apache.spark.sql.functions._
    // 2024-01-01 10:00:00 UTC as int64 nanos — the encoding the
    // testdata carried before the r9 regeneration flipped it to µs.
    val base = java.sql.Timestamp.valueOf("2024-01-01 10:00:00")
    val nanos = base.getTime * 1000000L
    val tmp = java.nio.file.Files.createTempDirectory("evnanos").toString
    Seq((1L, nanos, 7L, "click", 1.0, "{}"))
      .toDF("event_id", "ts", "user_id", "event_type", "value", "props")
      .write.mode("overwrite").parquet(s"$tmp/events.parquet")
    val ev = Tables.events(spark, tmp)
    assert(ev.schema("ts").dataType === TimestampType)
    assert(ev.select(col("ts")).head().getTimestamp(0) === base)
  }

  test("events loader fails loudly on an encoding it cannot normalise") {
    import spark.implicits._
    val tmp = java.nio.file.Files.createTempDirectory("evbad").toString
    Seq((1L, "2024-01-01T10:00:00", 7L, "click", 1.0, "{}"))
      .toDF("event_id", "ts", "user_id", "event_type", "value", "props")
      .write.mode("overwrite").parquet(s"$tmp/events.parquet")
    val e = intercept[IllegalStateException](Tables.events(spark, tmp))
    assert(e.getMessage.contains("unsupported type"))
  }

  test("documents/embeddings") {
    pin("documents", "doc_id" -> LongType, "text" -> StringType,
      "lang" -> StringType, "source" -> StringType, "n_chars" -> LongType)
    pin("embeddings", "vec_id" -> LongType,
      "embedding" -> ArrayType(FloatType), "label" -> IntegerType)
  }
}
