package graft.operators

import graft.TestSpark
import org.scalatest.funsuite.AnyFunSuite

/** Pins [[MergeInto]]'s semantics branch by branch on inline data and
  * the plan shape its scale claim rests on (the touched-key anti-join
  * BROADCASTS — the snapshot side never exchanges). q52's registry
  * hash pins the same algebra at every SF against the set-algebra
  * oracle.
  */
class MergeIntoSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  private def snap = Seq(
    (1L, "a", 10.0), (2L, "b", 20.0), (3L, "c", 30.0), (4L, "d", 40.0)
  ).toDF("k", "name", "v")

  test("updates replace, deletes remove, inserts append, survivors pass untouched") {
    val changes = Seq(
      (2L, "b2", 22.0, "U"),
      (3L, "c", 0.0, "D"),
      (9L, "i", 90.0, "I")
    ).toDF("k", "name", "v", "op")
    val out = MergeInto(snap, changes, "k")
      .collect().map(r => (r.getLong(0), r.getString(1), r.getDouble(2)))
      .sortBy(_._1).toSeq
    assert(out === Seq(
      (1L, "a", 10.0),   // survivor, untouched
      (2L, "b2", 22.0),  // updated payload, not the original
      (4L, "d", 40.0),   // survivor
      (9L, "i", 90.0)))  // inserted; 3 is gone
  }

  test("an empty changeset is the identity merge") {
    val none = Seq.empty[(Long, String, Double, String)]
      .toDF("k", "name", "v", "op")
    val out = MergeInto(snap, none, "k")
    assert(out.collect().map(_.toSeq).sortBy(_.toString) ===
      snap.collect().map(_.toSeq).sortBy(_.toString))
  }

  test("the touched-key anti-join broadcasts — the snapshot side plans no exchange") {
    val changes = Seq((2L, "x", 0.0, "U"), (3L, "y", 0.0, "D"))
      .toDF("k", "name", "v", "op")
    val out = MergeInto(snap, changes, "k")
    out.collect()
    // string-match the SETTLED plan: AQE nests the join inside query
    // stages a typed collect() does not descend
    val plan = out.queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastHashJoin") && plan.contains("LeftAnti"),
      s"anti-join did not broadcast:\n$plan")
  }
}
