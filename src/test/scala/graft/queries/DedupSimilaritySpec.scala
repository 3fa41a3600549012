package graft.queries

import graft.TestSpark
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Semantic cross-checks between the dedup and similarity families —
  * the properties a training-data pipeline actually relies on, beyond
  * the per-query DuckDB oracle (which pins values, not meaning):
  * near-dup detectors must agree with each other, and the ANN path
  * must approximate the brute-force baseline.
  */
class DedupSimilaritySpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark

  private val dir = "/root/testdata/sf0.001"

  test("exact dedup collapses the doubled corpus to one keeper per text") {
    val out = DedupQueries.d01_exact(spark, dir).cache()
    val docs = graft.Tables(spark, dir, "documents").count()
    assert(out.count() === docs)
    assert(out.agg(min(col("n_copies"))).head.getLong(0) === 2L)
    // keeper is always the original (un-offset) id
    assert(out.filter(col("keeper") >= 10000L).count() === 0L)
  }

  test("high-jaccard pairs are caught by MinHash LSH banding") {
    val jac = DedupQueries.d02_ngram_jaccard(spark, dir)
      .filter(col("jaccard") >= 0.5)
      .select("doc_a", "doc_b").collect().map(r => (r.getLong(0), r.getLong(1)))
    val lsh = DedupQueries.d03_minhash_lsh(spark, dir)
      .filter(col("n_bands") >= 1)
      .select("doc_a", "doc_b").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(jac.nonEmpty, "testdata should contain planted near-duplicates")
    val caught = jac.count(lsh.contains)
    assert(caught.toDouble / jac.length >= 0.9,
      s"LSH recall on jaccard≥0.5 pairs: $caught/${jac.length}")
  }

  test("near-dup pairs have small SimHash hamming distance") {
    val sh = DedupQueries.d04_simhash(spark, dir)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val pairs = DedupQueries.d02_ngram_jaccard(spark, dir)
      .filter(col("jaccard") >= 0.5)
      .select("doc_a", "doc_b").collect()
    assert(pairs.nonEmpty)
    pairs.foreach { r =>
      val d = java.lang.Long.bitCount(sh(r.getLong(0)) ^ sh(r.getLong(1)))
      assert(d <= 4, s"hamming(${r.getLong(0)}, ${r.getLong(1)}) = $d")
    }
  }

  test("LSH ANN returns true in-bucket neighbors no better than brute force") {
    val brute = SimilarityQueries.s01_knn_brute(spark, dir)
      .filter(col("rk") === 1)
      .select("qid", "cos").collect()
      .map(r => r.getLong(0) -> r.getDouble(1)).toMap
    val lsh = SimilarityQueries.s02_knn_lsh(spark, dir)
      .select("qid", "cos").collect()
      .map(r => r.getLong(0) -> r.getDouble(1)).toMap
    assert(lsh.nonEmpty)
    lsh.foreach { case (q, c) =>
      assert(c <= brute(q) + 1e-12, s"LSH beat brute force for q=$q")
    }
  }
}
