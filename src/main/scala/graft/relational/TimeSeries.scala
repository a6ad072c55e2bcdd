package graft.relational

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.{Q, Tables}

/** Time-series operators over the events table (round 7, second batch):
  * gaps-and-islands sessionization on the day grid, and fixed-grid
  * resampling with forward-fill — the two reshaping steps between raw
  * event logs and per-period models/monitoring.
  *
  * Scale notes (100 TB posture):
  *  - q_gap_islands: one user-keyed shuffle; the island assignment
  *    (day-index minus row_number) is partition-local window arithmetic,
  *    and the island aggregate reuses the same user partitioning — the
  *    plan has exactly one exchange.
  *  - q_ts_resample: the dense grid is hours×types (O(calendar), not
  *    O(events)) — the corpus collapses to per-(type, hour) partials
  *    first (map-side combined), so the grid join and the LOCF window
  *    run over thousands of rows regardless of input scale. The forward
  *    fill partitions by type, so no global-sort window appears.
  */
object TimeSeries {

  /** q_gap_islands — per-user activity islands: maximal runs of
    * consecutive active days (classic day_index − row_number grouping),
    * with span and event volume per island. */
  def qGapIslands(s: SparkSession, dir: String): DataFrame = {
    val days = Tables.events(s, dir)
      .select(col("user_id"), to_date(col("ts")).as("day"))
      .groupBy("user_id", "day")
      .agg(count(lit(1)).as("n_events"))
      .withColumn("day_idx",
        datediff(col("day"), lit("2024-01-01").cast("date")))
    val w = Window.partitionBy("user_id").orderBy("day")
    days
      .withColumn("grp", col("day_idx") - row_number().over(w))
      .groupBy("user_id", "grp")
      .agg(min("day").as("island_start"), max("day").as("island_end"),
        count(lit(1)).as("n_days"), sum("n_events").as("n_events"))
      .select("user_id", "island_start", "island_end", "n_days", "n_events")
      .orderBy("user_id", "island_start")
  }

  /** q_ts_resample — per-type hourly resample over the full global hour
    * grid: empty buckets appear with n=0 and a forward-filled (LOCF)
    * value from the latest preceding non-empty bucket (0 before the
    * first observation). The per-bucket mean is floor-truncated
    * (SURVEY §7.4.9) BEFORE the fill so both engines carry the same
    * filled value. */
  def qTsResample(s: SparkSession, dir: String): DataFrame = {
    val ev = Tables.events(s, dir)
    val agg = ev
      .groupBy(col("event_type"), date_trunc("hour", col("ts")).as("h"))
      .agg(count(lit(1)).as("cnt"),
        (floor(avg("value") * 1e6) / 1e6).as("v"))
    val grid = ev
      .agg(date_trunc("hour", min("ts")).as("h0"),
        date_trunc("hour", max("ts")).as("h1"))
      .select(explode(expr(
        "sequence(h0, h1, interval 1 hour)")).as("h"))
    val types = ev.select("event_type").distinct()
    val w = Window.partitionBy("event_type").orderBy("h")
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    types.crossJoin(grid)
      .join(agg, Seq("event_type", "h"), "left")
      .withColumn("n", coalesce(col("cnt"), lit(0L)))
      .withColumn("v_filled",
        coalesce(last(col("v"), ignoreNulls = true).over(w), lit(0.0)))
      .select("event_type", "h", "n", "v_filled")
      .orderBy("event_type", "h")
  }

  val queries: Map[String, Q] = Map(
    "q_gap_islands" -> (qGapIslands _),
    "q_ts_resample" -> (qTsResample _))

  val oracle: Map[String, String] = Map(
    "q_gap_islands" ->
      """WITH days AS (
        |  SELECT user_id, ts::DATE AS day, COUNT(*) AS n_events
        |  FROM events GROUP BY 1, 2),
        |grp AS (
        |  SELECT user_id, day, n_events,
        |    (day - DATE '2024-01-01')
        |      - row_number() OVER (PARTITION BY user_id ORDER BY day)
        |      AS grp
        |  FROM days)
        |SELECT user_id, MIN(day) AS island_start, MAX(day) AS island_end,
        |  COUNT(*) AS n_days, CAST(SUM(n_events) AS BIGINT) AS n_events
        |FROM grp
        |GROUP BY user_id, grp
        |ORDER BY user_id, island_start""".stripMargin,
    "q_ts_resample" ->
      """WITH b AS (
        |  SELECT date_trunc('hour', MIN(ts)) AS h0,
        |    date_trunc('hour', MAX(ts)) AS h1 FROM events),
        |grid AS (
        |  SELECT unnest(generate_series(h0, h1, INTERVAL 1 HOUR)) AS h
        |  FROM b),
        |agg AS (
        |  SELECT event_type, date_trunc('hour', ts) AS h,
        |    COUNT(*) AS cnt, floor(AVG(value) * 1e6) / 1e6 AS v
        |  FROM events GROUP BY 1, 2),
        |types AS (SELECT DISTINCT event_type FROM events)
        |SELECT t.event_type, g.h, coalesce(a.cnt, 0) AS n,
        |  coalesce(last_value(a.v IGNORE NULLS) OVER (
        |    PARTITION BY t.event_type ORDER BY g.h
        |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW), 0.0)
        |    AS v_filled
        |FROM types t
        |CROSS JOIN grid g
        |LEFT JOIN agg a ON a.event_type = t.event_type AND a.h = g.h
        |ORDER BY t.event_type, g.h""".stripMargin)
}
