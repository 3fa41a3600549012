package graft.queries

import graft.TestSpark
import graft.multimodal.MediaCodecs
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Plumbing invariants for the multimodal family: the stub decoder is
  * fake, but the binary schema, typed mapPartitions path, and sampling
  * must behave exactly as a real codec integration would.
  */
class MultimodalSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark

  private val dir = "/root/testdata/sf0.001"

  test("media table carries a real BinaryType payload with exact lengths") {
    val m = MultimodalQueries.media(spark, dir)
    assert(m.schema("payload").dataType ===
      org.apache.spark.sql.types.BinaryType)
    val bad = m.filter(octet_length(col("payload")) =!= col("n_bytes")).count()
    assert(bad === 0L)
  }

  test("stub decoder: fixed dim, histogram sums to payload length") {
    val payload = "hello world 123".getBytes("UTF-8")
    val f = MediaCodecs.decodeFeaturesStub(payload)
    assert(f.length === MediaCodecs.FeatureDim)
    assert(math.abs(f.sum - 1.0f) < 1e-5f)
  }

  test("typed feature extraction yields one fixed-dim row per doc") {
    val docs = graft.Tables(spark, dir, "documents").count()
    val feats = MultimodalQueries.m02_features(spark, dir).cache()
    assert(feats.count() === docs)
    // signature always has FeatureDim fields
    val badDims = feats
      .filter(size(split(col("feat_sig"), "-")) =!= MediaCodecs.FeatureDim)
      .count()
    assert(badDims === 0L)
  }

  test("frame sampling keeps every 4th frame of video payloads only") {
    val frames = MultimodalQueries.m03_frame_sample(spark, dir).cache()
    assert(frames.filter(col("frame_idx") % 4 =!= 0).count() === 0L)
    val videoDocs = MultimodalQueries.media(spark, dir)
      .filter(col("media_type") === "video").count()
    assert(frames.select("doc_id").distinct().count() === videoDocs)
  }

  test("resize stub gathers nearest-neighbor bytes from the source grid") {
    // 64-byte payload = 2 full 32-byte rows: thumb row r reads source
    // row (r*2)/8 = 0 for r<4, 1 for r>=4; column c reads byte 4c.
    val payload = Array.tabulate(64)(_.toByte)
    val out = MediaCodecs.resizeStub(payload,
      MediaCodecs.ThumbEdge, MediaCodecs.ThumbEdge)
    assert(out.length === 64)
    for (r <- 0 until 8; c <- 0 until 8)
      assert(out(r * 8 + c) === payload((r * 2 / 8) * 32 + c * 4),
        s"thumb($r,$c)")
  }

  test("m05 emits one thumbnail digest per image doc with its grid height") {
    val media = MultimodalQueries.media(spark, dir)
      .filter(col("media_type") === "image")
      .select("doc_id", "n_bytes").collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    val rows = MultimodalQueries.m05_resize(spark, dir).collect()
    assert(rows.length === media.size)
    rows.foreach { r =>
      val (id, h, dig) = (r.getLong(0), r.getLong(1), r.getString(2))
      assert(h === media(id) / MediaCodecs.ImageRowBytes, s"doc $id src_h")
      assert(h >= 1, s"doc $id shorter than one grid row")
      assert(dig.length === 32, s"doc $id digest")
    }
  }

  test("media NN stays within the query's media_type and under cos=1") {
    val rows = MultimodalQueries.m04_media_nn(spark, dir).collect()
    assert(rows.nonEmpty)
    val types = MultimodalQueries.media(spark, dir)
      .select("doc_id", "media_type").collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    rows.foreach { r =>
      val (qid, mt, nn, cos) =
        (r.getLong(0), r.getString(1), r.getLong(2), r.getDouble(3))
      assert(types(qid) === mt, s"q=$qid type mismatch")
      assert(types(nn) === mt, s"q=$qid nn=$nn crossed media types")
      assert(cos <= 1.0 + 1e-12 && cos >= -1.0 - 1e-12, s"q=$qid cos=$cos")
    }
  }

  test("payload dedup collapses the doubled media corpus to one keeper per asset") {
    val base = MultimodalQueries.media(spark, dir)
      .select("doc_id", "media_type").collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    val rows = MultimodalQueries.m06_payload_dedup(spark, dir).collect()
      .map(r => (r.getString(0), r.getString(1), r.getLong(2), r.getLong(3)))
    // one group per unique base asset; each has its planted re-ingest
    assert(rows.length === base.size)
    rows.foreach { case (mt, _, keeper, n) =>
      assert(n === 2L, s"asset $keeper") // base + planted copy
      assert(base(keeper) === mt, s"keeper $keeper not from the base corpus")
    }
  }

  test("audio energy windows match the per-byte definition") {
    val got = MultimodalQueries.m08_audio_energy(spark, dir).collect()
      .map(r => (r.getLong(0), r.getLong(1)) -> ((r.getLong(2), r.getLong(3))))
      .toMap
    val audio = MultimodalQueries.media(spark, dir)
      .filter(col("media_type") === "audio")
      .select("doc_id", "payload").collect()
      .map(r => r.getLong(0) -> r.getAs[Array[Byte]](1))
    assert(audio.nonEmpty)
    val W = MediaCodecs.AudioWinBytes
    val expected = audio.flatMap { case (id, p) =>
      p.grouped(W).zipWithIndex.collect { case (win, i) if win.length == W =>
        val vs = win.map(b => (b & 0xff).toLong)
        (id, i.toLong) -> ((vs.map(v => v * v).sum, vs.max))
      }
    }.toMap
    assert(got === expected)
  }

  test("phash near-dup recovers every re-ingested image copy at hamming 0") {
    val media = MultimodalQueries.media(spark, dir)
      .select("doc_id", "media_type", "n_bytes").collect()
      .map(r => (r.getLong(0), r.getString(1), r.getLong(2)))
    val off = media.map(_._1).max + 1
    val imgs = media.collect { case (id, "image", n)
      if n >= MediaCodecs.ImageRowBytes => id }.toSet
    assert(imgs.nonEmpty)

    val pairs = MultimodalQueries.m07_phash_neardup(spark, dir).collect()
      .map(r => (r.getLong(0), r.getLong(1)) -> r.getLong(2)).toMap
    // structural recall: an exact-pixel re-ingest always lands at
    // hamming 0, and banding is pigeonhole-lossless, so every planted
    // (base, base+off) pair must be present
    imgs.foreach { id =>
      assert(pairs.get((id, id + off)).contains(0L), s"planted pair for $id")
    }
    // and nothing reported beyond the hamming bound
    pairs.values.foreach(h => assert(h >= 0L && h <= 3L))
  }
}
