package graft.stream

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.{Q, Tables}

/** Streaming operators over the events table (SURVEY §2.11).
  *
  * Each operator is a `DataFrame => DataFrame` transform defined ONCE and
  * run in two modes: batch (against the parquet table, verified by the
  * DuckDB oracle here) and streaming (MemoryStream + watermark in the
  * scalatest suite, asserting batch ≡ stream on closed windows). The
  * `*Transform` members are the shared definitions.
  *
  * Scale notes: tumbling/sliding windows are hash aggregations keyed by
  * (window, type) — partial-aggregated before the shuffle, state per
  * group O(1). Sessionization is the lag+cumsum shape: one shuffle on
  * user_id, then partition-local window scans; in streaming mode the same
  * semantics come from session_window with a watermark bounding state.
  */
object EventOps {

  /** Tumbling 1h windows × event_type: count + sum. */
  def tumblingTransform(df: DataFrame): DataFrame =
    df.groupBy(window(col("ts"), "1 hour"), col("event_type"))
      .agg(count(lit(1)).as("cnt"), round(sum("value"), 2).as("sum_value"))
      .select(col("window.start").as("window_start"), col("event_type"),
        col("cnt"), col("sum_value"))

  /** q_stream_tumbling — batch form of the tumbling-window aggregate. */
  def qStreamTumbling(s: SparkSession, dir: String): DataFrame =
    tumblingTransform(Tables.events(s, dir))
      .orderBy("window_start", "event_type")

  /** Sliding 1h windows every 30min: count per window. */
  def slidingTransform(df: DataFrame): DataFrame =
    df.groupBy(window(col("ts"), "1 hour", "30 minutes"))
      .agg(count(lit(1)).as("cnt"), round(sum("value"), 2).as("sum_value"))
      .select(col("window.start").as("window_start"), col("cnt"),
        col("sum_value"))

  /** q_stream_sliding — batch form of the sliding-window aggregate. */
  def qStreamSliding(s: SparkSession, dir: String): DataFrame =
    slidingTransform(Tables.events(s, dir)).orderBy("window_start")

  /** Batch sessionization: split per-user event streams on >30min gaps
    * (lag + cumulative-sum-of-breaks — the oracle-matchable form of
    * session_window). */
  def sessionTransform(df: DataFrame): DataFrame = {
    val byUser = Window.partitionBy("user_id").orderBy(col("ts"),
      col("event_id"))
    val gapUs = 30L * 60 * 1000 * 1000
    df.withColumn("us", unix_micros(col("ts")))
      .withColumn("prev_us", lag(col("us"), 1).over(byUser))
      .withColumn("brk",
        when(col("prev_us").isNull ||
          col("us") - col("prev_us") > gapUs, 1L).otherwise(0L))
      .withColumn("session_id", sum("brk").over(
        byUser.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
      .groupBy("user_id", "session_id")
      .agg(min("ts").as("session_start"), max("ts").as("session_end"),
        count(lit(1)).as("n_events"), round(sum("value"), 2).as("sum_value"))
  }

  /** Streaming sessionization: the REAL `session_window` operator (30 min
    * gap), the stream-mode twin of sessionTransform — state is bounded by
    * the watermark and sessions are emitted when it passes their end.
    * Semantics note vs the lag+cumsum form: session_window keeps a session
    * open while the next event starts strictly BEFORE last_ts + gap, while
    * the batch form breaks on ts − prev > gap — the two differ only for
    * gaps of exactly 30 min (StreamingSpec avoids that boundary; real
    * event-time data never sits on it exactly). `session_window.start`
    * equals the session's min(ts), so closed sessions compare 1:1 with
    * the batch output on (user, start, count, sum). */
  def sessionWindowTransform(df: DataFrame): DataFrame =
    df.groupBy(col("user_id"), session_window(col("ts"), "30 minutes"))
      .agg(count(lit(1)).as("n_events"),
        round(sum("value"), 2).as("sum_value"))
      .select(col("user_id"),
        col("session_window.start").as("session_start"),
        col("n_events"), col("sum_value"))

  /** q_stream_session — batch sessionization per user (30min gap). */
  def qStreamSession(s: SparkSession, dir: String): DataFrame =
    sessionTransform(Tables.events(s, dir))
      .orderBy("user_id", "session_id")

  /** Dedup on event_id (streaming mode adds a watermark bound). */
  def dedupTransform(df: DataFrame): DataFrame =
    df.dropDuplicates("event_id")
      .select("event_id", "user_id", "event_type", "value")

  /** q_stream_dedup — batch form of streaming dropDuplicates. */
  def qStreamDedup(s: SparkSession, dir: String): DataFrame =
    dedupTransform(Tables.events(s, dir)).orderBy("event_id")

  /** Stream-stream interval join: each purchase matched to the same
    * user's clicks in the preceding 10 minutes. In streaming mode both
    * inputs carry a watermark and the time-range condition bounds the
    * join state (rows older than watermark − 10 min are evicted) — the
    * canonical Structured Streaming join shape. Batch mode plans the
    * identical condition as an equi-join on user_id with a range
    * residual. */
  def joinTransform(clicks: DataFrame, purchases: DataFrame): DataFrame = {
    val c = clicks.select(col("ts").as("c_ts"),
      col("user_id").as("c_user"), col("value").as("c_value"))
    val p = purchases.select(col("event_id").as("purchase_id"),
      col("ts").as("p_ts"), col("user_id").as("p_user"))
    p.join(c, col("c_user") === col("p_user") &&
      col("c_ts") >= col("p_ts") - expr("INTERVAL 10 MINUTES") &&
      col("c_ts") <= col("p_ts"))
  }

  /** q_stream_join — batch form: per purchase, count + value of the
    * user's clicks in the 10 minutes before it (purchases with no such
    * click are absent — inner join). */
  def qStreamJoin(s: SparkSession, dir: String): DataFrame = {
    val ev = Tables.events(s, dir)
    joinTransform(
      ev.filter(col("event_type") === "click"),
      ev.filter(col("event_type") === "purchase"))
      .groupBy("purchase_id")
      .agg(count(lit(1)).as("n_clicks"),
        round(sum("c_value"), 2).as("click_value"))
      .orderBy("purchase_id")
  }

  /** q_merge_upsert — changelog latest-wins compaction (the batch half of
    * a CDC/upsert pipeline): per (user_id, event_type) entity, keep the
    * newest version (ts desc, event_id desc tie-break) and report how many
    * versions it superseded. One shuffle on the entity key, then
    * partition-local window scans — the log-compaction shape that at
    * 100 TB runs per partition of a date-partitioned changelog. The
    * streaming twin is the latest-state stateful op
    * (transformWithState/flatMapGroupsWithState, StreamingSpec). */
  def qMergeUpsert(s: SparkSession, dir: String): DataFrame = {
    val entity = Window.partitionBy("user_id", "event_type")
    Tables.events(s, dir)
      .withColumn("rn", row_number().over(
        entity.orderBy(col("ts").desc, col("event_id").desc)))
      .withColumn("n_versions", count(lit(1)).over(entity))
      .filter(col("rn") === 1)
      .select(col("user_id"), col("event_type"),
        col("event_id").as("last_event_id"), col("ts").as("last_ts"),
        col("value").as("last_value"), col("n_versions"))
      .orderBy("user_id", "event_type")
  }

  /** q_scd2_intervals — slowly-changing-dimension type-2 build (round 7):
    * every event version of an entity becomes a validity interval
    * [valid_from = its ts, valid_to = next version's ts), open-ended (and
    * flagged current) for the latest — the history table a warehouse
    * derives from a CDC changelog, and the interval twin of
    * q_merge_upsert's latest-wins compaction. Same shape at scale: one
    * shuffle on the entity key, then partition-local window scans.
    * Ordering (and the oracle's) uses the µs-truncated ts with event_id
    * tie-break — the q_merge_upsert ns-vs-µs lesson (SURVEY §7.4.11). */
  def qScd2Intervals(s: SparkSession, dir: String): DataFrame = {
    val entity = Window.partitionBy("user_id", "event_type")
      .orderBy(col("ts"), col("event_id"))
    Tables.events(s, dir)
      .withColumn("version", row_number().over(entity))
      .withColumn("valid_to", lead(col("ts"), 1).over(entity))
      .withColumn("is_current", col("valid_to").isNull)
      .select(col("user_id"), col("event_type"), col("event_id"),
        col("version"), col("ts").as("valid_from"), col("valid_to"),
        col("is_current"))
      .orderBy("user_id", "event_type", "version")
  }

  val queries: Map[String, Q] = Map(
    "q_scd2_intervals" -> (qScd2Intervals _),
    "q_stream_tumbling" -> (qStreamTumbling _),
    "q_stream_sliding" -> (qStreamSliding _),
    "q_stream_session" -> (qStreamSession _),
    "q_stream_dedup" -> (qStreamDedup _),
    "q_stream_join" -> (qStreamJoin _),
    "q_merge_upsert" -> (qMergeUpsert _))

  val oracle: Map[String, String] = Map(
    "q_scd2_intervals" ->
      """SELECT user_id, event_type, event_id, version,
        |  CAST(ts AS TIMESTAMP) AS valid_from,
        |  -- lead over the µs-truncated cast: Spark sees µs (Tables.events)
        |  lead(CAST(ts AS TIMESTAMP)) OVER w AS valid_to,
        |  lead(CAST(ts AS TIMESTAMP)) OVER w IS NULL AS is_current
        |FROM (SELECT *,
        |    CAST(row_number() OVER (PARTITION BY user_id, event_type
        |      ORDER BY CAST(ts AS TIMESTAMP), event_id) AS INT) AS version
        |  FROM events)
        |WINDOW w AS (PARTITION BY user_id, event_type
        |  ORDER BY CAST(ts AS TIMESTAMP), event_id)
        |ORDER BY user_id, event_type, version""".stripMargin,
    "q_stream_tumbling" ->
      """SELECT CAST(date_trunc('hour', ts) AS TIMESTAMP) AS window_start,
        |  event_type, COUNT(*) AS cnt, ROUND(SUM(value), 2) AS sum_value
        |FROM events
        |GROUP BY 1, 2
        |ORDER BY window_start, event_type""".stripMargin,
    "q_stream_sliding" ->
      """WITH assigned AS (
        |  SELECT CAST(time_bucket(INTERVAL '30 minutes', ts) AS TIMESTAMP)
        |    AS w, value FROM events
        |  UNION ALL
        |  SELECT CAST(time_bucket(INTERVAL '30 minutes', ts)
        |    - INTERVAL '30 minutes' AS TIMESTAMP) AS w, value FROM events)
        |SELECT w AS window_start, COUNT(*) AS cnt,
        |  ROUND(SUM(value), 2) AS sum_value
        |FROM assigned
        |GROUP BY w
        |ORDER BY window_start""".stripMargin,
    "q_stream_session" ->
      """WITH t AS (
        |  SELECT user_id, event_id, ts, value, epoch_us(ts) AS us,
        |    lag(epoch_us(ts)) OVER
        |      (PARTITION BY user_id ORDER BY ts, event_id) AS prev_us
        |  FROM events),
        |b AS (
        |  SELECT *, CASE WHEN prev_us IS NULL
        |      OR us - prev_us > 1800000000 THEN 1 ELSE 0 END AS brk
        |  FROM t),
        |sess AS (
        |  -- CAST: DuckDB integer window SUM yields HUGEINT (→ float in the
        |  -- driver's compare); Spark's sum(long) is BIGINT
        |  SELECT *, CAST(SUM(brk) OVER (PARTITION BY user_id
        |    ORDER BY ts, event_id
        |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT)
        |    AS session_id
        |  FROM b)
        |SELECT user_id, session_id, MIN(ts) AS session_start,
        |  MAX(ts) AS session_end, COUNT(*) AS n_events,
        |  ROUND(SUM(value), 2) AS sum_value
        |FROM sess
        |GROUP BY user_id, session_id
        |ORDER BY user_id, session_id""".stripMargin,
    "q_stream_dedup" ->
      """SELECT event_id, user_id, event_type, value
        |FROM (SELECT *, row_number() OVER (PARTITION BY event_id
        |        ORDER BY ts) AS rn FROM events)
        |WHERE rn = 1
        |ORDER BY event_id""".stripMargin,
    "q_stream_join" ->
      """SELECT p.event_id AS purchase_id, COUNT(*) AS n_clicks,
        |  ROUND(SUM(c.value), 2) AS click_value
        |FROM events p JOIN events c
        |  ON c.user_id = p.user_id
        | AND p.event_type = 'purchase' AND c.event_type = 'click'
        | AND c.ts >= p.ts - INTERVAL '10 minutes' AND c.ts <= p.ts
        |GROUP BY 1
        |ORDER BY purchase_id""".stripMargin,
    "q_merge_upsert" ->
      """SELECT user_id, event_type, event_id AS last_event_id,
        |  CAST(ts AS TIMESTAMP) AS last_ts, value AS last_value, n_versions
        |-- ORDER BY the µs-truncated cast, not raw ns ts: Spark sees µs
        |-- (Tables.events), so a µs-level tie must break on event_id in
        |-- BOTH engines (the q_join_asof lesson, SURVEY §7.4)
        |FROM (SELECT *,
        |    row_number() OVER (PARTITION BY user_id, event_type
        |      ORDER BY CAST(ts AS TIMESTAMP) DESC, event_id DESC) AS rn,
        |    COUNT(*) OVER (PARTITION BY user_id, event_type)
        |      AS n_versions
        |  FROM events)
        |WHERE rn = 1
        |ORDER BY user_id, event_type""".stripMargin)
}
