package graft.ext

import graft.{Det, Tables}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Time-series / event-stream operators over the `events` table (batch
  * analogs of the Structured Streaming surface in [[graft.streaming]]):
  * tumbling and sliding window aggregation, sessionization
  * (gaps-and-islands), and JSON property extraction.
  */
object EventOps {

  /** Tumbling 1-hour window aggregation via Spark's window() — the exact
    * batch analog of a streaming groupBy(window(...)). Window starts are
    * epoch-aligned, so the oracle's date_trunc('hour') matches.
    */
  def tumbling(s: SparkSession, d: String): DataFrame =
    Tables.events(s, d)
      .groupBy(window(col("ts"), "1 hour"), col("event_type"))
      .agg(count(lit(1)).as("n_events"), Det.dsum(col("value")).as("sum_value"))
      .select(col("window.start").as("hour_start"), col("event_type"),
        col("n_events"), col("sum_value"))
      .orderBy(col("hour_start"), col("event_type"))

  /** Sliding windows (1 hour every 30 min) — each event lands in exactly
    * two windows; Spark expands them natively, the oracle mirrors with a
    * two-way shifted-truncation union.
    */
  def sliding(s: SparkSession, d: String): DataFrame =
    Tables.events(s, d)
      .groupBy(window(col("ts"), "1 hour", "30 minutes"))
      .agg(count(lit(1)).as("n_events"), Det.dsum(col("value")).as("sum_value"))
      .select(col("window.start").as("win_start"), col("n_events"), col("sum_value"))
      .orderBy(col("win_start"))

  /** Sessionization, gaps-and-islands form: a new session starts after a
    * >30-minute silence per user; sessions get row_number ids and
    * per-session rollups. The streaming twin uses mapGroupsWithState
    * ([[graft.streaming.StreamOps]]); this is the backfill/batch form.
    */
  def sessionize(s: SparkSession, d: String): DataFrame = {
    val byUser = Window.partitionBy(col("user_id")).orderBy(col("ts"), col("event_id"))
    val cum = Window.partitionBy(col("user_id")).orderBy(col("ts"), col("event_id"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    Tables.events(s, d)
      .withColumn("prev_us", lag(unix_micros(col("ts")), 1).over(byUser))
      .withColumn("new_sess",
        when(col("prev_us").isNull
          || unix_micros(col("ts")) - col("prev_us") > 1800L * 1000000L, 1L)
          .otherwise(0L))
      .withColumn("session_id", sum(col("new_sess")).over(cum))
      .groupBy(col("user_id"), col("session_id"))
      .agg(count(lit(1)).as("n_events"),
        min(col("ts")).as("session_start"),
        max(col("ts")).as("session_end"),
        Det.dsum(col("value")).as("sum_value"))
      .orderBy(col("user_id"), col("session_id"))
  }

  /** Native session_window (gap-close 30 min): Spark's built-in session
    * assignment must produce exactly the sessions the gaps-and-islands
    * window form derives — the oracle IS the gaps-and-islands SQL, so the
    * two formulations cross-validate.
    */
  def sessionWindowNative(s: SparkSession, d: String): DataFrame =
    Tables.events(s, d)
      .groupBy(col("user_id"), session_window(col("ts"), "30 minutes"))
      .agg(count(lit(1)).as("n_events"), Det.dsum(col("value")).as("sum_value"))
      .select(col("user_id"),
        col("session_window.start").as("session_start"),
        col("n_events"), col("sum_value"))
      .orderBy(col("user_id"), col("session_start"))

  /** JSON property extraction (events.props is a JSON string): pull $.k,
    * cast, aggregate — get_json_object ↔ json_extract_string.
    */
  def jsonProps(s: SparkSession, d: String): DataFrame =
    Tables.events(s, d)
      .withColumn("k", get_json_object(col("props"), "$.k").cast("int"))
      .groupBy(col("event_type"))
      .agg(count(lit(1)).as("n_events"),
        sum(col("k").cast("long")).as("sum_k"),
        min(col("k")).as("min_k"), max(col("k")).as("max_k"))
      .withColumn("avg_k", col("sum_k").cast("double") / col("n_events"))
      .orderBy(col("event_type"))

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "ev_tumbling" -> tumbling,
    "ev_sliding" -> sliding,
    "ev_sessionize" -> sessionize,
    "ev_session_window" -> sessionWindowNative,
    "ev_json_props" -> jsonProps
  )

  val oracle: Map[String, String] = Map(
    "ev_tumbling" ->
      """SELECT date_trunc('hour', ts) AS hour_start, event_type,
        |       COUNT(*) AS n_events,
        |       CAST(SUM(CAST(value AS DECIMAL(30,4))) AS DOUBLE) AS sum_value
        |FROM events GROUP BY 1, 2 ORDER BY hour_start, event_type""".stripMargin,
    "ev_sliding" ->
      """WITH expanded AS (
        |  SELECT CAST(to_timestamp(CAST(floor(epoch(ts)/1800) AS BIGINT)*1800) AS TIMESTAMP) AS win_start, value FROM events
        |  UNION ALL
        |  SELECT CAST(to_timestamp((CAST(floor(epoch(ts)/1800) AS BIGINT)-1)*1800) AS TIMESTAMP) AS win_start, value FROM events)
        |SELECT win_start, COUNT(*) AS n_events,
        |       CAST(SUM(CAST(value AS DECIMAL(30,4))) AS DOUBLE) AS sum_value
        |FROM expanded GROUP BY 1 ORDER BY win_start""".stripMargin,
    "ev_sessionize" ->
      """WITH marked AS (
        |  SELECT user_id, event_id, ts, value,
        |         CASE WHEN lag(epoch_us(ts)) OVER w IS NULL
        |                OR epoch_us(ts) - lag(epoch_us(ts)) OVER w > 1800000000
        |              THEN 1::BIGINT ELSE 0::BIGINT END AS new_sess
        |  FROM events
        |  WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)),
        |sess AS (
        |  SELECT *, CAST(SUM(new_sess) OVER (PARTITION BY user_id ORDER BY ts, event_id
        |                                     ROWS UNBOUNDED PRECEDING) AS BIGINT) AS session_id
        |  FROM marked)
        |SELECT user_id, session_id, COUNT(*) AS n_events,
        |       MIN(ts) AS session_start, MAX(ts) AS session_end,
        |       CAST(SUM(CAST(value AS DECIMAL(30,4))) AS DOUBLE) AS sum_value
        |FROM sess GROUP BY 1, 2 ORDER BY user_id, session_id""".stripMargin,
    "ev_session_window" ->
      """WITH marked AS (
        |  SELECT user_id, event_id, ts, value,
        |         -- session_window semantics: a new session starts when the
        |         -- gap is >= the timeout (the window is [start, last+gap))
        |         CASE WHEN lag(epoch_us(ts)) OVER w IS NULL
        |                OR epoch_us(ts) - lag(epoch_us(ts)) OVER w >= 1800000000
        |              THEN 1::BIGINT ELSE 0::BIGINT END AS new_sess
        |  FROM events
        |  WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)),
        |sess AS (
        |  SELECT *, CAST(SUM(new_sess) OVER (PARTITION BY user_id ORDER BY ts, event_id
        |                                     ROWS UNBOUNDED PRECEDING) AS BIGINT) AS session_id
        |  FROM marked)
        |SELECT user_id, MIN(ts) AS session_start, COUNT(*) AS n_events,
        |       CAST(SUM(CAST(value AS DECIMAL(30,4))) AS DOUBLE) AS sum_value
        |FROM sess GROUP BY user_id, session_id
        |ORDER BY user_id, session_start""".stripMargin,
    "ev_json_props" ->
      """SELECT event_type, COUNT(*) AS n_events,
        |       CAST(SUM(CAST(json_extract_string(props, '$.k') AS BIGINT)) AS BIGINT) AS sum_k,
        |       MIN(CAST(json_extract_string(props, '$.k') AS INT)) AS min_k,
        |       MAX(CAST(json_extract_string(props, '$.k') AS INT)) AS max_k,
        |       CAST(SUM(CAST(json_extract_string(props, '$.k') AS BIGINT)) AS DOUBLE) / COUNT(*) AS avg_k
        |FROM events GROUP BY 1 ORDER BY event_type""".stripMargin
  )
}
