package graft.queries

import graft.TestSpark
import org.scalatest.funsuite.AnyFunSuite

/** t06's repetition signals recomputed brute-force from the raw text:
  * the distributed two-shuffle aggregation must agree bit-for-bit with
  * the obvious per-document definition (each fraction is one double
  * division of two exact integers, so equality is exact, not ε).
  */
class TextQueriesSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark

  private val dir = "/root/testdata/sf0.01"

  test("t06 repetition signals match the per-document definition exactly") {
    val got = TextQueries.t06_repetition(spark, dir).collect()
      .map(r => r.getLong(0) -> ((r.getDouble(1), r.getDouble(2), r.getBoolean(3))))
      .toMap

    val docs = graft.Tables(spark, dir, "documents")
      .select("doc_id", "text").collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap

    val expected = docs.collect { case (id, text) =>
      val w = text.split(" ")
      (id, w)
    }.filter(_._2.length >= 3).map { case (id, w) =>
      val bigrams = w.sliding(2).map(_.mkString(" ")).toSeq
      val topf = bigrams.groupBy(identity).values.map(_.size).max.toDouble /
        bigrams.size.toDouble
      val tris = w.sliding(3).map(_.mkString(" ")).toSeq
      val dupf = (tris.size - tris.distinct.size).toDouble / tris.size.toDouble
      id -> ((topf, dupf, topf > 0.08 || dupf > 0.05))
    }

    assert(got.keySet === expected.keySet)
    expected.foreach { case (id, want) =>
      assert(got(id) === want, s"doc $id")
    }
    // the gate bites on the fixture, in both directions
    assert(got.values.exists(_._3) && got.values.exists(!_._3))
  }

  test("t07 rarity equals the brute-force corpus-frequency definition") {
    val docs = graft.Tables(spark, dir, "documents")
      .select("doc_id", "text").collect()
      .map(r => r.getLong(0) -> r.getString(1).split(" ").toSeq).toMap
    val dict = docs.values.flatten.groupBy(identity).view
      .mapValues(_.size.toLong).toMap
    val expected = docs.map { case (id, ws) =>
      val total = ws.map(dict).sum
      id -> ((ws.size.toLong, total, ws.map(dict).min,
        total.toDouble / ws.size.toDouble))
    }
    val got = TextQueries.t07_rarity(spark, dir).collect()
      .map(r => r.getLong(0) ->
        ((r.getLong(1), r.getLong(2), r.getLong(3), r.getDouble(4))))
      .toMap
    assert(got === expected)
    // rarity varies on the fixture — the signal is discriminative
    assert(got.values.map(_._4).toSet.size > 1)
  }
}
