package graft.queries

import graft.Tables
import graft.streaming.{BandRow, Ev, StreamOps}
import org.apache.spark.sql.{DataFrame, Dataset, Encoder, SparkSession}
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.streaming.OutputMode

/** Batch twins of the streaming operators
  * ([[graft.streaming.StreamOps]]) over the `events` table, PLUS two
  * registry entries (st01/st02) that execute the REAL incremental
  * path — `transformWithState` with RocksDB state, a micro-batch, the
  * state store — inside the driver contract, so streaming execution
  * itself is DuckDB-oracle-checked rather than spec-pinned only.
  *
  * Oracle notes: window starts are epoch-aligned in both engines
  * (Spark `window()` floors to the epoch; DuckDB `time_bucket` with a
  * pinned epoch origin); session windows are the classic
  * gaps-and-islands rewrite; double sums go through DECIMAL(28,2) so
  * accumulation order can't flip the last ulp.
  */
object StreamQueries {

  // Tumbling 5-minute windows per event_type with exact value sums —
  // the batch twin of StreamOps.windowedCounts.
  def q23_event_windows(s: SparkSession, dir: String): DataFrame =
    graft.streaming.StreamOps.windowedCounts(Tables.events(s, dir))

  // Gap-based sessions (5-minute inactivity gap) per user — the batch
  // twin of StreamOps.sessions.
  def q24_sessions(s: SparkSession, dir: String): DataFrame =
    graft.streaming.StreamOps.sessions(Tables.events(s, dir))

  /** Unique memory-sink names per invocation: Bench samples each
    * query 3×, and a reused queryName would return the FIRST run's
    * table for every later run.
    */
  private val sinkSeq = new java.util.concurrent.atomic.AtomicLong(0L)

  /** Drive a StreamOps transform through a real one-micro-batch
    * streaming query: MemoryStream source (the input relation
    * collected to the driver — the harness ADAPTER, sized for the
    * oracle SFs; at scale the source is Kafka/files and everything
    * downstream of `in.toDS()` is unchanged), `transformWithState`
    * with the RocksDB state store, memory sink. Returns the sink
    * table. Single-batch feed keeps the output deterministic (both
    * registered processors fold a batch in a data-defined order), so
    * the driver's hash compare applies to a STREAMING execution.
    *
    * Measured adapter envelope: fine through sf1 (1M events ≈ 120 MB
    * collected); at sf10 the 10M-event driver-held feed plus the
    * single-batch streaming shuffle OOMs a 24 GB heap — the sf10
    * sweep excludes the st family for exactly this documented reason
    * (the TRANSFORMS' scale behavior is measured via their batch
    * twins q23/q24/q44/d13, which share the plans; only the feed
    * mechanism is small-SF).
    */
  private def runOneBatch[T: Encoder, O](s: SparkSession, rows: Seq[T],
      transform: Dataset[T] => Dataset[O]): DataFrame = {
    implicit val sqlCtx = s.sqlContext
    val name = "graft_stream_sink_" + sinkSeq.incrementAndGet()
    val provKey = "spark.sql.streaming.stateStore.providerClass"
    val prev = s.conf.getOption(provKey)
    s.conf.set(provKey,
      "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
    try {
      val in = MemoryStream[T]
      in.addData(rows)
      val q = transform(in.toDS()).writeStream.format("memory")
        .queryName(name).outputMode(OutputMode.Append).start()
      try q.processAllAvailable() finally q.stop()
      s.table(name)
    } finally prev match {
      case Some(p) => s.conf.set(provKey, p)
      case None => s.conf.unset(provKey)
    }
  }

  /** Streaming retention cells ([[StreamOps.retentionCells]]) run for
    * real: one micro-batch of the whole `events` table through the
    * RetentionProcessor's per-user (cohort, seen-mask) ValueState.
    * Output is one (user_id, cohort_day, age_days) cell per first
    * sighting inside the 64-day horizon — on a single in-order batch
    * exactly the distinct (user, day) relation the oracle derives, so
    * the state machine itself is hash-checked.
    */
  def st01_retention_stream(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val evs = Tables.events(s, dir)
      .select("event_id", "ts", "user_id", "event_type", "value")
      .as[Ev].collect().toSeq
    runOneBatch[Ev, graft.streaming.RetCell](s, evs, StreamOps.retentionCells)
  }

  /** Streaming LSH bucket-novelty gate ([[StreamOps.bucketNovelty]])
    * run for real: the `documents` minhash band relation
    * ([[DedupQueries.minhashBands]]) as one micro-batch through the
    * BucketNoveltyProcessor's per-(band, bkey) owner ValueState. A
    * row's `first_seen` = its doc claimed the bucket = it is the
    * bucket's minimum doc_id (deterministic within a batch by
    * construction), which is exactly the oracle's grouped-min
    * derivation over the same band CTE as d03/d13.
    */
  def st02_novelty_stream(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val bands = DedupQueries.minhashBands(s, dir)
      .select("doc_id", "band", "bkey").as[BandRow].collect().toSeq
    runOneBatch[BandRow, graft.streaming.BandHit](s, bands, StreamOps.bucketNovelty)
  }

  /** The stream–stream INTERVAL self-join ([[StreamOps.errorFollowJoin]])
    * run for real — the third streaming state machinery in the
    * registry after transformWithState (st01/st02): a symmetric JOIN
    * state store holding both sides' rows inside the watermark+bound
    * horizon. One micro-batch of `events`; inner stream-stream joins
    * emit matches eagerly, so the single-batch output is exactly the
    * batch pair relation (q29's un-aggregated form) and hash-checks
    * against the plain SQL join.
    */
  def st03_error_follow_stream(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val evs = Tables.events(s, dir)
      .select("event_id", "ts", "user_id", "event_type", "value")
      .as[Ev].collect().toSeq
    runOneBatch[Ev, org.apache.spark.sql.Row](s, evs,
      ds => StreamOps.errorFollowJoin(ds.toDF()))
  }

  val oracle: Map[String, String] = Map(
    "st03_error_follow_stream" ->
      """SELECT r.event_id AS err_id, e.event_id AS follow_id,
        |  e.user_id, e.ts, e.value
        |FROM events r JOIN events e
        |  ON r.event_type = 'error' AND e.user_id = r.user_id
        |  AND e.ts > r.ts AND e.ts <= r.ts + INTERVAL '10 minutes'""".stripMargin,
    "st01_retention_stream" ->
      """WITH act AS (SELECT DISTINCT user_id,
        |    CAST(CAST(ts AS DATE) - DATE '1970-01-01' AS BIGINT) AS day
        |  FROM events),
        |f AS (SELECT user_id, MIN(day) AS cohort_day FROM act GROUP BY 1)
        |SELECT act.user_id, f.cohort_day, act.day - f.cohort_day AS age_days
        |FROM act JOIN f USING (user_id)
        |WHERE act.day - f.cohort_day < 64""".stripMargin,
    "st02_novelty_stream" -> (DedupQueries.BandsCte + """
        |SELECT b.doc_id, b.band, b.bkey, b.doc_id = m.mn AS first_seen
        |FROM bands b JOIN (SELECT band, bkey, MIN(doc_id) AS mn
        |  FROM bands GROUP BY 1, 2) m
        |  ON b.band = m.band AND b.bkey = m.bkey""".stripMargin),
    "q23_event_windows" ->
      """SELECT time_bucket(INTERVAL '5 minutes', ts,
        |    TIMESTAMP '1970-01-01 00:00:00') AS window_start,
        |  event_type, COUNT(*) AS n_events,
        |  CAST(SUM(CAST(value AS DECIMAL(28,2))) AS DOUBLE) AS total_value
        |FROM events GROUP BY 1, 2""".stripMargin,
    "q24_sessions" ->
      """WITH flagged AS (
        |  SELECT user_id, ts, value,
        |    CASE WHEN ts - LAG(ts) OVER (PARTITION BY user_id ORDER BY ts)
        |         >= INTERVAL '5 minutes' THEN 1 ELSE 0 END AS new_s
        |  FROM events),
        |sid AS (
        |  SELECT user_id, ts, value,
        |    SUM(new_s) OVER (PARTITION BY user_id ORDER BY ts
        |      ROWS UNBOUNDED PRECEDING) AS s
        |  FROM flagged)
        |SELECT user_id, MIN(ts) AS session_start,
        |  MAX(ts) + INTERVAL '5 minutes' AS session_end,
        |  COUNT(*) AS n_events,
        |  CAST(SUM(CAST(value AS DECIMAL(28,2))) AS DOUBLE) AS total_value
        |FROM sid GROUP BY user_id, s""".stripMargin,
  )

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q23_event_windows" -> (q23_event_windows _),
    "q24_sessions" -> (q24_sessions _),
    "st01_retention_stream" -> (st01_retention_stream _),
    "st02_novelty_stream" -> (st02_novelty_stream _),
    "st03_error_follow_stream" -> (st03_error_follow_stream _),
  )
}
