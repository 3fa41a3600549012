package graft.operators

import java.sql.Timestamp

import graft.TestSpark
import org.scalatest.funsuite.AnyFunSuite

class AsOfJoinSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  private def ts(m: Int): Timestamp = Timestamp.valueOf(f"2024-01-01 10:$m%02d:00")

  test("asof picks the newest right row at-or-before each left row, per key") {
    import spark.implicits._
    val left = Seq(
      (1L, 100L, ts(0)), (2L, 100L, ts(10)), (3L, 100L, ts(20)),
      (4L, 200L, ts(5))).toDF("id", "k", "ts")
    val right = Seq(
      (100L, ts(10), "a"), (100L, ts(15), "b"), (200L, ts(6), "c"))
      .toDF("k", "ts", "v")
    val out = AsOfJoin.asof(left, right, "k", "ts", Seq("v"))
      .collect().map(r => r.getLong(0) ->
        (Option(r.getTimestamp(3)), Option(r.getString(4)))).toMap
    assert(out(1L) === ((None, None)))                  // nothing before 10:00
    assert(out(2L) === ((Some(ts(10)), Some("a"))))     // tie: inclusive
    assert(out(3L) === ((Some(ts(15)), Some("b"))))     // newest before 10:20
    assert(out(4L) === ((None, None)))                  // 10:06 is after 10:05
  }

  test("null payload on the newest right row is NOT spliced from an older row") {
    import spark.implicits._
    val left = Seq((1L, 100L, ts(20))).toDF("id", "k", "ts")
    val right = Seq(
      (100L, ts(5), Some("old")),
      (100L, ts(10), None: Option[String])) // newest match, null payload
      .toDF("k", "ts", "v")
    val r = AsOfJoin.asof(left, right, "k", "ts", Seq("v")).collect().head
    // All right-side fields must come from the ts(10) row: asof_ts is
    // 10:10 and asof_v is NULL — not ("old" from 10:05, ts from 10:10).
    assert(r.getTimestamp(3) === ts(10))
    assert(r.isNullAt(4))
  }

  test("left columns and row count are preserved (left-outer semantics)") {
    import spark.implicits._
    val left = Seq((1L, 9L, ts(1), "x")).toDF("id", "k", "ts", "extra")
    val right = Seq((8L, ts(0), 1.5)).toDF("k", "ts", "w") // other key
    val out = AsOfJoin.asof(left, right, "k", "ts", Seq("w"))
    assert(out.columns.toSeq ===
      Seq("id", "k", "ts", "extra", "asof_ts", "asof_w"))
    val r = out.collect()
    assert(r.length === 1 && r.head.getString(3) === "x" && r.head.isNullAt(5))
  }
}
