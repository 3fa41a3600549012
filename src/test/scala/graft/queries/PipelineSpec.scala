package graft.queries

import graft.TestSpark
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** p01's composition semantics: the kept set is exactly the docs that
  * pass every gate of the three upstream stages — no gate silently
  * drops or resurrects a row through the joins.
  */
class PipelineSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark

  private val dir = "/root/testdata/sf0.001"

  test("curation keeps exactly the intersection of the three gates") {
    val kept = PipelineQueries.p01_curate(spark, dir)
      .select("doc_id").collect().map(_.getLong(0)).toSet

    val lang = TextQueries.t03_langid(spark, dir)
      .select("doc_id", "pred_lang").collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    val keepers = DedupQueries.d06_neardup_clusters(spark, dir)
      .filter(col("is_keeper")).select("doc_id").collect()
      .map(_.getLong(0)).toSet
    val expected = TextQueries.t04_quality(spark, dir).collect().filter { r =>
      val (id, n, stop, digit, mtl) = (r.getLong(0), r.getLong(1),
        r.getDouble(2), r.getDouble(3), r.getDouble(4))
      lang(id) == "en" && n >= 30L &&
        stop >= 0.01 && stop <= 0.15 && digit <= 0.2 && mtl <= 5.0 &&
        keepers.contains(id)
    }.map(_.getLong(0)).toSet

    assert(expected.nonEmpty, "fixture should curate a non-empty corpus")
    assert(kept === expected)
    // the gates actually bite: curation is a strict subset of keepers
    assert(kept.size < keepers.size)
  }

  test("balanced sample equals the unsalted per-language top-N") {
    // The salted two-phase top-N must be LOSSLESS: identical rows (and
    // ranks) to the single-window definition, for every language —
    // the property that lets the 100 TB plan avoid one-task-per-stratum
    // windows without changing the sample.
    import org.apache.spark.sql.expressions.Window
    val got = PipelineQueries.p02_balanced_sample(spark, dir)
      .collect().map(r => (r.getLong(0), r.getString(1), r.getInt(2))).toSet
    val w = Window.partitionBy(col("lang"))
      .orderBy(col("key"), col("doc_id"))
    val want = graft.Tables(spark, dir, "documents")
      .select(col("doc_id"), col("lang"),
        md5(col("text").cast("binary")).as("key"))
      .withColumn("rn", row_number().over(w))
      .filter(col("rn") <= 40)
      .select("doc_id", "lang", "rn")
      .collect().map(r => (r.getLong(0), r.getString(1), r.getInt(2))).toSet
    assert(want.nonEmpty)
    assert(got === want)
    // every language stratum is capped, none is empty on the fixture
    val perLang = got.groupBy(_._2).view.mapValues(_.size)
    assert(perLang.values.forall(n => n > 0 && n <= 40))
  }

  test("contamination check matches the n-gram-collision definition") {
    // sf0.01: the fixture corpus has near-dup pairs straddling the
    // eval split, so both flag outcomes occur.
    val d = "/root/testdata/sf0.01"
    val got = PipelineQueries.p04_contamination(spark, d).collect()
      .map(r => r.getLong(0) ->
        ((r.getLong(1), r.getLong(2), r.getDouble(3), r.getBoolean(4))))
      .toMap

    val grams = graft.Tables(spark, d, "documents")
      .select("doc_id", "text").collect()
      .map(r => r.getLong(0) -> r.getString(1).split(" "))
      .filter(_._2.length >= 8)
      .map { case (id, w) => id -> w.sliding(8).map(_.mkString(" ")).toSet }
      .toMap
    val evalSet = grams.collect { case (id, g) if id % 20 == 0 => g }
      .foldLeft(Set.empty[String])(_ ++ _)
    val expected = grams.collect { case (id, g) if id % 20 != 0 =>
      val hits = g.count(evalSet.contains).toLong
      id -> ((g.size.toLong, hits, hits.toDouble / g.size.toDouble, hits > 0))
    }

    assert(got.keySet === expected.keySet) // train docs only, all of them
    expected.foreach { case (id, want) => assert(got(id) === want, s"doc $id") }
    assert(got.values.exists(_._4) && got.values.exists(!_._4))
  }

  test("mixture weights are a normalized sqrt-flattening of token shares") {
    val rows = PipelineQueries.p05_mixture(spark, dir).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2),
        r.getDouble(3), r.getDouble(4), r.getDouble(5)))
    val toks = graft.Tables(spark, dir, "documents")
      .select(col("source"), size(split(col("text"), " ")).cast("long"))
      .collect().map(r => r.getString(0) -> r.getLong(1))
      .groupBy(_._1).view.mapValues(_.map(_._2).sum).toMap
    val total = toks.values.sum.toDouble
    assert(rows.map(_._1).toSet === toks.keySet)
    rows.foreach { case (src, _, t, share, _, _) =>
      assert(t === toks(src) && share === t / total, src)
    }
    // weights normalize, and the temperature actually flattens: the
    // biggest share is downsampled, the smallest upsampled
    assert(math.abs(rows.map(_._5).sum - 1.0) < 1e-9)
    val byShare = rows.sortBy(_._4)
    assert(byShare.last._6 < 1.0 && byShare.head._6 > 1.0,
      s"flattening inverted: ${byShare.head} ${byShare.last}")
    // monotone: larger share never gets a smaller weight
    byShare.sliding(2).foreach { case Array(a, b) =>
      assert(a._5 <= b._5, s"weight not monotone in share: $a vs $b")
    }
  }

  test("split assignment is content-keyed and lands near 80/10/10") {
    val d = "/root/testdata/sf0.01"
    val rows = PipelineQueries.p06_split(spark, d).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getString(2)))
    assert(rows.length === 500)
    rows.foreach { case (_, b, sp) =>
      assert(b >= 0 && b < 100)
      assert(sp === (if (b < 80) "train" else if (b < 90) "val" else "test"))
    }
    val frac = rows.groupBy(_._3).view.mapValues(_.size / 500.0).toMap
    assert(frac("train") > 0.7 && frac("train") < 0.9)
    assert(frac("val") > 0.04 && frac("test") > 0.04)
    // content-keyed: identical text (d01's planted dups exist only in
    // the unioned corpus, so here same doc => same bucket trivially) —
    // assert determinism across a re-run instead
    val again = PipelineQueries.p06_split(spark, d).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getString(2)))
    assert(rows.sortBy(_._1).toSeq === again.sortBy(_._1).toSeq)
  }

  test("packing lays each shard head-to-tail with no gaps or overlaps") {
    val rows = PipelineQueries.p03_pack(spark, dir)
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    val toks = graft.Tables(spark, dir, "documents")
      .select(col("doc_id"), size(split(col("text"), " ")).cast("long"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(rows.map(_._1).distinct.length === toks.size) // every doc, once
    rows.groupBy(_._2).foreach { case (shard, docs) =>
      var expectedStart = 0L
      docs.sortBy(_._1).foreach { case (id, _, chunk, off) =>
        assert(id % 16 === shard)
        // (chunk, off) are exactly the head-to-tail cumsum coordinates
        assert(chunk === expectedStart / 512 && off === expectedStart % 512,
          s"doc $id in shard $shard")
        expectedStart += toks(id)
      }
    }
  }

  test("curriculum positions are a stage-ordered permutation of 0..n-1") {
    val rows = PipelineQueries.p08_curriculum(spark, dir).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    val n = graft.Tables(spark, dir, "documents").count()
    assert(rows.length === n.toInt)
    // exactly the positions 0..n-1, each once
    assert(rows.map(_._4).sorted.toSeq === (0L until n).toSeq)
    // stages are globally ordered: every doc of bucket b trains
    // before any doc of bucket b+1
    val byBucket = rows.groupBy(_._2).view
      .mapValues(v => (v.map(_._4).min, v.map(_._4).max)).toMap
    byBucket.keys.toSeq.sorted.sliding(2).foreach {
      case Seq(a, b) => assert(byBucket(a)._2 < byBucket(b)._1, s"$a vs $b")
      case _ =>
    }
    // bucket really is the length stage
    val nt = graft.Tables(spark, dir, "documents")
      .select(col("doc_id"), size(split(col("text"), " ")).cast("long"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    rows.foreach { case (id, bucket, _, _) =>
      assert(bucket === math.min(nt(id) / 32, 7L), s"doc $id")
    }
  }

  test("source report reconciles with corpus totals and dup flags") {
    val rows = PipelineQueries.p09_source_report(spark, dir).collect()
      .map(r => r.getString(0) -> ((r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4), r.getDouble(5)))).toMap
    val d = graft.Tables(spark, dir, "documents")
      .select("source", "text").collect()
      .map(r => (r.getString(0), r.getString(1)))
    assert(rows.keySet === d.map(_._1).toSet)
    assert(rows.values.map(_._1).sum === d.length.toLong)
    assert(rows.values.map(_._2).sum ===
      d.map(_._2.split(" ").length.toLong).sum)
    val dupTexts = d.groupBy(_._2).filter(_._2.length > 1).keySet
    val dupBySource = d.filter(t => dupTexts(t._2)).groupBy(_._1)
      .map { case (s, v) => s -> v.size.toLong }
    rows.foreach { case (src, (n, toks, _, dups, meanToks)) =>
      assert(dups === dupBySource.getOrElse(src, 0L), src)
      assert(math.abs(meanToks - toks.toDouble / n) < 1e-12, src)
    }
  }

  test("mixture sampler admits by content hash against the p05 thresholds") {
    val got = PipelineQueries.p07_mixture_sample(spark, dir).collect()
      .map(r => r.getLong(0) ->
        ((r.getString(1), r.getLong(2), r.getLong(3), r.getBoolean(4))))
      .toMap
    val boosts = PipelineQueries.p05_mixture(spark, dir).collect()
      .map(r => r.getString(0) -> r.getDouble(5)).toMap
    val docs = graft.Tables(spark, dir, "documents")
      .select("doc_id", "source", "text").collect()
    assert(got.size === docs.length)
    docs.foreach { r =>
      val (id, src, text) = (r.getLong(0), r.getString(1), r.getString(2))
      val h = text.foldLeft(0L)((a, c) => (a * 31 + c.toLong) % 2147483647L)
      val bucket = h % 1000000L
      val thr =
        math.floor(math.min(1.0, 0.5 * boosts(src)) * 1000000L.toDouble).toLong
      assert(got(id) === ((src, bucket, thr, bucket < thr)), s"doc $id")
    }
    // The gate bites in both directions. (No per-source rate band:
    // at sf0.001 a source is ~50 docs, and convergence of the hash
    // admission rate to the target is O(1/√n) — the per-doc exact
    // check above is the deterministic contract.)
    assert(got.values.exists(_._4) && got.values.exists(!_._4))
  }
}
