package graft.queries

import graft.Tables
import org.apache.spark.sql.{DataFrame, SparkSession}

/** Batch twins of the streaming operators
  * ([[graft.streaming.StreamOps]]) over the `events` table. The SAME
  * transform functions run here on a batch frame (watermark a no-op)
  * and in the MemoryStream specs on a readStream frame — so the DuckDB
  * oracle checks the transform logic once, and the streaming specs pin
  * the incremental execution to it.
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

  val oracle: Map[String, String] = Map(
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
  )
}
