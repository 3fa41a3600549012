package graft.queries

import graft.Tables
import graft.multimodal.{MediaCodecs, MediaFeatures, MediaRow}
import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Multimodal-column queries: binary payloads derived deterministically
  * from `documents.text` (`encode(text, 'UTF-8')`), so the plumbing is
  * exercised end-to-end AND oracle-checkable — the corpus is pure
  * ASCII, so payload bytes equal the text's character codes and DuckDB
  * can recompute every value from the string side while Spark computes
  * it from the real `BinaryType` column.
  *
  * At scale: payloads stay opaque through scan→shuffle→sink (no decode
  * in the plan except the explicit feature stage), metadata lives in
  * ordinary pruned columns, and the feature stage is a per-partition
  * batched map ([[MediaCodecs.decodeFeaturesStub]] marks where a real
  * codec plugs in).
  */
object MultimodalQueries {

  private def t(s: SparkSession, dir: String, name: String): DataFrame =
    Tables(s, dir, name)

  /** The binary media table: doc_id, media_type tag, payload bytes,
    * byte length. Spark side of the shared derivation.
    */
  def media(s: SparkSession, dir: String): DataFrame =
    t(s, dir, "documents")
      .select(col("doc_id"),
        when(col("doc_id") % 3 === 0, "image")
          .when(col("doc_id") % 3 === 1, "audio")
          .otherwise("video").as("media_type"),
        encode(col("text"), "UTF-8").as("payload"))
      .withColumn("n_bytes", octet_length(col("payload")).cast(LongType))

  // Binary metadata scan: length, content digest, head byte — the
  // "catalog pass" over a multimodal table that never decodes payloads.
  def m01_binary_meta(s: SparkSession, dir: String): DataFrame =
    media(s, dir)
      .select(col("doc_id"), col("media_type"), col("n_bytes"),
        md5(col("payload")).as("digest"),
        expr("CAST(ascii(CAST(substring(payload, 1, 1) AS STRING)) AS BIGINT)")
          .as("head_byte"))

  // Typed per-partition feature extraction through the stub decoder:
  // Dataset[MediaRow] → mapPartitions → Dataset[MediaFeatures]. The
  // iterator-to-iterator shape keeps memory bounded per partition
  // (nothing is materialized per-task beyond one row's payload), which
  // is what makes this safe on TB-scale payload columns. Features are
  // stringified (scaled to int) because the checker can't sort arrays.
  def m02_features(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val rows: Dataset[MediaRow] = media(s, dir).as[MediaRow]
    rows.mapPartitions { it =>
      it.map { r =>
        MediaFeatures(r.doc_id, r.n_bytes,
          MediaCodecs.decodeFeaturesStub(r.payload))
      }
    }.select(col("doc_id"), col("n_bytes"),
      // float→double is exact, double×10⁶ is one IEEE op: bit-stable
      // signature on both engines.
      // FLOOR, not a bare cast: DuckDB's double→BIGINT cast rounds
      // half-away while Spark's truncates; floor(x≥0) agrees everywhere.
      expr("concat_ws('-', transform(features, " +
        "f -> CAST(CAST(FLOOR(CAST(f AS DOUBLE) * 1000000) AS BIGINT) AS STRING)))")
        .as("feat_sig"))
  }

  // Pseudo-frame sampling from a video-typed payload: slice the byte
  // stream into 32-byte frames, keep every 4th, digest each — the
  // explode/sample plumbing of a real frame extractor, with the demux
  // stubbed as fixed-width slicing.
  def m03_frame_sample(s: SparkSession, dir: String): DataFrame =
    media(s, dir)
      .filter(col("media_type") === "video")
      .select(col("doc_id"), col("payload"),
        explode(expr(s"sequence(0, CAST((n_bytes - 1) DIV ${MediaCodecs.FrameBytes} AS INT))"))
          .as("frame_idx"))
      .filter(col("frame_idx") % 4 === 0)
      .select(col("doc_id"), col("frame_idx").cast(LongType).as("frame_idx"),
        md5(expr(s"substring(payload, frame_idx * ${MediaCodecs.FrameBytes} + 1, " +
          s"${MediaCodecs.FrameBytes})")).as("frame_digest"))

  /** Oracle twin of the media derivation (string side; bytes == chars
    * on this ASCII corpus).
    */
  private val MediaCte: String =
    """WITH media AS (SELECT doc_id,
      |  CASE WHEN doc_id % 3 = 0 THEN 'image'
      |       WHEN doc_id % 3 = 1 THEN 'audio'
      |       ELSE 'video' END AS media_type,
      |  text AS payload,
      |  CAST(LENGTH(text) AS BIGINT) AS n_bytes
      |FROM documents)""".stripMargin

  val oracle: Map[String, String] = Map(
    "m01_binary_meta" -> (MediaCte + """
      |SELECT doc_id, media_type, n_bytes,
      |  MD5(payload) AS digest,
      |  CAST(ASCII(SUBSTRING(payload, 1, 1)) AS BIGINT) AS head_byte
      |FROM media""".stripMargin),
    "m02_features" -> (MediaCte + s""",
      |codes AS (SELECT doc_id, UNNEST(LIST_TRANSFORM(STRING_SPLIT(payload, ''),
      |    ch -> ASCII(ch))) AS c
      |  FROM media),
      |cnts AS (SELECT doc_id, c * 16 // 256 AS bin, COUNT(*) AS cnt
      |  FROM codes GROUP BY 1, 2),
      |grid AS (SELECT m.doc_id, m.n_bytes, b.bin
      |  FROM media m, (SELECT UNNEST(RANGE(0, 16)) AS bin) b),
      |bins AS (SELECT grid.doc_id, grid.n_bytes, grid.bin,
      |    CAST(COALESCE(cnts.cnt, 0) AS BIGINT) AS cnt
      |  FROM grid LEFT JOIN cnts
      |    ON grid.doc_id = cnts.doc_id AND grid.bin = cnts.bin)
      |SELECT doc_id, n_bytes,
      |  STRING_AGG(CAST(CAST(FLOOR(CAST(CAST(CAST(cnt AS FLOAT) / CAST(n_bytes AS FLOAT) AS FLOAT) AS DOUBLE) * 1000000) AS BIGINT) AS VARCHAR),
      |    '-' ORDER BY bin) AS feat_sig
      |FROM bins GROUP BY doc_id, n_bytes""".stripMargin),
    "m03_frame_sample" -> (MediaCte + s""",
      |frames AS (SELECT doc_id, payload,
      |    UNNEST(RANGE(0, ((n_bytes - 1) // 32) + 1)) AS frame_idx
      |  FROM media WHERE media_type = 'video')
      |SELECT doc_id, CAST(frame_idx AS BIGINT) AS frame_idx,
      |  MD5(SUBSTRING(payload, CAST(frame_idx * 32 + 1 AS INT), 32)) AS frame_digest
      |FROM frames WHERE frame_idx % 4 = 0""".stripMargin),
  )

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "m01_binary_meta" -> (m01_binary_meta _),
    "m02_features" -> (m02_features _),
    "m03_frame_sample" -> (m03_frame_sample _),
  )
}
