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

  test("t10 tf-idf top-3 matches the brute-force definition exactly") {
    val got = TextQueries.t10_tfidf(spark, dir).collect()
      .map(r => (r.getLong(0), r.getString(1), r.getLong(2), r.getLong(3),
        r.getLong(4)))
      .toSet

    val docs = graft.Tables(spark, dir, "documents")
      .select("doc_id", "text").collect()
      .map(r => r.getLong(0) -> r.getString(1))
    val nd = docs.length.toLong
    val tf = docs.flatMap { case (id, t) =>
      t.split(" ").groupBy(identity).map { case (w, o) => (id, w, o.length.toLong) }
    }
    val df = tf.groupBy(_._2).map { case (w, v) => w -> v.length.toLong }
    val expected = tf.toSeq.map { case (id, w, c) =>
      (id, w, c, df(w), c * ((nd * (1L << 20)) / df(w)))
    }.groupBy(_._1).toSeq.flatMap { case (_, rows) =>
      rows.sortBy { case (_, w, _, _, sc) => (-sc, w) }.take(3)
    }.toSet

    assert(got === expected)
    // every doc yields exactly 3 keywords on this fixture
    assert(got.size === nd * 3)
  }

  test("t11 collocations are the brute-force top-20 by lift") {
    val got = TextQueries.t11_collocations(spark, dir).collect()
      .map(r => (r.getString(0), r.getString(1), r.getLong(2), r.getLong(3),
        r.getLong(4), r.getDouble(5))).toSet

    val docs = graft.Tables(spark, dir, "documents")
      .select("text").collect().map(_.getString(0))
    val bigrams = docs.flatMap { t =>
      val w = t.split(" ")
      if (w.length >= 2) w.sliding(2).map(p => (p(0), p(1))).toSeq else Nil
    }
    val c12 = bigrams.groupBy(identity).map { case (k, v) => k -> v.size.toLong }
    val c1 = c12.groupBy(_._1._1).map { case (w1, m) => w1 -> m.values.sum }
    val c2 = c12.groupBy(_._1._2).map { case (w2, m) => w2 -> m.values.sum }
    val n = c12.values.sum
    val expected = c12.toSeq
      .filter { case ((a, b), _) => c1(a) >= 50 && c2(b) >= 50 }
      .map { case ((a, b), c) =>
        (a, b, c, c1(a), c2(b), c.toDouble * n / c1(a) / c2(b))
      }
      .sortBy { case (a, b, _, _, _, l) => (-l, a, b) }
      .take(20).toSet
    assert(got === expected)
    // lifts are meaningful: every reported pair beats independence
    got.foreach { case (_, _, _, _, _, l) => assert(l > 1.0) }
  }

  test("t09 bigram LM scores match the per-document definition exactly") {
    val got = TextQueries.t09_lm_score(spark, dir).collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2), r.getDouble(3))))
      .toMap

    val docs = graft.Tables(spark, dir, "documents")
      .select("doc_id", "text").collect()
      .map(r => r.getLong(0) -> r.getString(1))
    val Q = 1L << 30
    val vocab = docs.flatMap(_._2.split(" ")).distinct.length.toLong
    val bigrams = docs.toSeq.flatMap { case (id, t) =>
      val w = t.split(" ")
      if (w.length >= 2) w.sliding(2).map(p => (id, p(0), p(1))).toSeq
      else Seq.empty
    }
    val c2 = bigrams.groupBy(b => (b._2, b._3)).map { case (k, v) => k -> v.size.toLong }
    val c1 = c2.groupBy(_._1._1).map { case (w1, m) => w1 -> m.values.sum }
    val expected = bigrams.groupBy(_._1).map { case (id, bs) =>
      val n = bs.size.toLong
      // identical op order to the query: one divide, one multiply, floor
      val sum = bs.iterator.map { case (_, w1, w2) =>
        math.floor((c2((w1, w2)) + 1).toDouble / (c1(w1) + vocab).toDouble * Q).toLong
      }.sum
      id -> ((n, sum, sum.toDouble / n.toDouble / Q.toDouble))
    }
    assert(got.keySet === expected.keySet)
    expected.foreach { case (id, want) => assert(got(id) === want, s"doc $id") }
    // smoothed probabilities are genuine probabilities
    assert(got.values.forall { case (_, _, p) => p > 0.0 && p < 1.0 })
  }

  test("t08 redaction catches planted PII and is idempotent") {
    import spark.implicits._
    import org.apache.spark.sql.functions.col
    // The corpus oracle run only proves precision (no false positives
    // on clean text); recall needs PII that the testdata deliberately
    // lacks — plant every pattern class, plus near-misses that must
    // NOT match.
    val fixture = Seq(
      (1L, "reach bob.smith+spam@mail-host.org or alice@sub.example.io today"),
      (2L, "call 555-123-4567 or 555 987 6543 after noon"),
      (3L, "server at 10.0.0.1 and 192.168.254.254 went down"),
      (4L, "mixed: eve@corp.net pinged 172.16.0.9 at 555.111.2222"),
      (5L, "near misses: bob@nodot 999-99-9999 1.2.3 version 1.2.3.4.5"),
      (6L, "clean text with no contact details at all")
    ).toDF("doc_id", "text")
    val got = TextQueries.redact(fixture).collect()
      .map(r => r.getLong(0) ->
        ((r.getLong(1), r.getLong(2), r.getLong(3), r.getString(4)))).toMap

    assert(got(1L) === ((2L, 0L, 0L, "reach <EMAIL> or <EMAIL> today")))
    assert(got(2L) === ((0L, 2L, 0L, "call <PHONE> or <PHONE> after noon")))
    assert(got(3L) === ((0L, 0L, 2L, "server at <IP> and <IP> went down")))
    // doc 4: 555.111.2222 is a phone (dot separators, only two dots —
    // not IP-shaped); the three pattern classes hit once each.
    assert(got(4L) === ((1L, 1L, 1L, "mixed: <EMAIL> pinged <IP> at <PHONE>")))
    // near-misses: no dotted TLD → not an email; SSN shape (3-2-4) ≠
    // phone shape (3-3-4); 1.2.3 too short; but 1.2.3.4.5 DOES contain
    // the IP-shaped 1.2.3.4 prefix — a documented over-match of the
    // anchor-free pattern, pinned here so a pattern change is visible.
    assert((got(5L)._1, got(5L)._2, got(5L)._3) === ((0L, 0L, 1L)))
    assert(got(6L) === ((0L, 0L, 0L, "clean text with no contact details at all")))

    // Idempotence: placeholders contain nothing any pattern matches.
    val once = TextQueries.redact(fixture)
      .select(col("doc_id"), col("clean_text").as("text"))
    val twice = TextQueries.redact(once).collect()
      .map(r => r.getLong(0) -> r.getString(4)).toMap
    got.foreach { case (id, (_, _, _, clean)) =>
      assert(twice(id) === clean, s"doc $id not idempotent")
    }

    // Corpus run: provably inactive on the synthetic testdata — the
    // d02_posting_audit stance: the no-op case is hash-checked by the
    // oracle, the active case pinned here.
    val corpus = TextQueries.t08_redact(spark, dir)
    assert(corpus.filter(
      col("n_emails") + col("n_phones") + col("n_ips") > 0).count() === 0L)
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

  test("heavy hitters: the degenerate pigeonhole regimes fall back to the plain plan, same answer") {
    import org.apache.spark.sql.functions._
    // The pigeonhole floor ⌈T/P⌉ degenerates to 1 when P ≥ T — then
    // "candidates" would mean the whole vocabulary broadcast to the
    // driver (r13 advice). The kernel must detect it, take the plain
    // one-exchange groupBy, and return the identical exact answer.
    val toks = graft.Tables(spark, dir, "documents")
      .select(explode(split(col("text"), " ")).as("w"))
    def rows(df: org.apache.spark.sql.DataFrame) =
      df.collect().map(r => (r.getString(0), r.getLong(1))).sorted.toSeq
    def plain(hhMin: Long) = rows(
      toks.groupBy(col("w")).agg(count(lit(1)).as("n"))
        .filter(col("n") >= hhMin))
    // degenerate: threshold below the partition count → lo = 1
    val manyParts = toks.repartition(16)
    assert(rows(TextQueries.heavyHitters(manyParts, 8L)) === rows(
      manyParts.groupBy(col("w")).agg(count(lit(1)).as("n"))
        .filter(col("n") >= 8L)))
    val deg = TextQueries.heavyHitters(manyParts, 8L)
    assert(!deg.queryExecution.optimizedPlan.toString.contains("LocalRelation"),
      "degenerate regime still planned the candidate prefilter join")
    // healthy regime: the two-pass prefilter path, same exact answer.
    // The candidate kernel now runs EAGERLY (take-bounded, r14 advice —
    // no lingering persist), so the returned plan carries the
    // localized candidate set as a broadcast LocalRelation join, not
    // the SerializeFromObject kernel itself.
    val hh = TextQueries.heavyHitters(toks, 100L)
    assert(rows(hh) === plain(100L))
    val hhPlan = hh.queryExecution.optimizedPlan.toString
    assert(hhPlan.contains("LocalRelation") && hhPlan.contains("Join"),
      "healthy regime lost the candidate prefilter join")
  }
}
