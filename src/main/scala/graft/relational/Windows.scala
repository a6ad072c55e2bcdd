package graft.relational

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.{Q, Tables}

/** Window functions (SURVEY §2.5).
  *
  * Scale notes (100 TB posture): every window here partitions on a real key
  * (o_custkey / user_id / o_orderstatus) — one shuffle on the partition key,
  * then partition-local sort; no global single-partition window, which would
  * serialize the whole table through one task at scale.
  *
  * Determinism: every ORDER BY inside a window carries a unique key
  * tie-break (o_orderkey / event_id) so ranks and offsets are reproducible
  * across engines (SURVEY §2.5 header). Running float sums are rounded:
  * engines may associate frame sums differently (e.g. segment trees), so
  * raw doubles are not bit-comparable.
  */
object Windows {

  private def byCustomer = Window.partitionBy("o_custkey")
    .orderBy(col("o_orderdate"), col("o_orderkey"))

  /** q_window_rank — ranking family over orders per customer. */
  def qWindowRank(s: SparkSession, dir: String): DataFrame =
    Tables.orders(s, dir)
      .select(col("o_custkey"), col("o_orderkey"),
        row_number().over(byCustomer).as("rn"),
        rank().over(byCustomer).as("rnk"),
        dense_rank().over(byCustomer).as("drnk"))
      .orderBy("o_custkey", "o_orderkey")

  /** q_window_analytic — offset/value family. first/last/nth use an
    * explicit whole-partition frame on both engines (last_value's default
    * frame ends at CURRENT ROW — a classic cross-engine trap). */
  def qWindowAnalytic(s: SparkSession, dir: String): DataFrame = {
    val whole = byCustomer
      .rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
    Tables.orders(s, dir)
      .select(col("o_custkey"), col("o_orderkey"),
        lag("o_totalprice", 1).over(byCustomer).as("prev_price"),
        lead("o_totalprice", 1).over(byCustomer).as("next_price"),
        first("o_totalprice").over(whole).as("first_price"),
        last("o_totalprice").over(whole).as("last_price"),
        nth_value(col("o_totalprice"), 2).over(whole).as("second_price"))
      .orderBy("o_custkey", "o_orderkey")
  }

  /** q_window_frame_rows — running sum + 3-row moving average per user
    * over events. Total order inside the window: (ts, event_id). */
  def qWindowFrameRows(s: SparkSession, dir: String): DataFrame = {
    val w = Window.partitionBy("user_id").orderBy(col("ts"), col("event_id"))
    Tables.events(s, dir)
      .select(col("user_id"), col("event_id"),
        round(sum("value").over(
          w.rowsBetween(Window.unboundedPreceding, Window.currentRow)), 4)
          .as("running_sum"),
        round(avg("value").over(w.rowsBetween(-2, 0)), 4).as("mov_avg3"))
      .orderBy("user_id", "event_id")
  }

  /** q_window_frame_range — 30-day trailing sum of order totals per
    * customer; RANGE frame expressed on an integer epoch-day column to
    * dodge interval-dialect skew (SURVEY §7.4.4). */
  def qWindowFrameRange(s: SparkSession, dir: String): DataFrame = {
    val days = datediff(col("o_orderdate"), to_date(lit("1970-01-01")))
    val w = Window.partitionBy("o_custkey").orderBy(col("day"))
      .rangeBetween(-30, 0)
    Tables.orders(s, dir)
      .withColumn("day", days)
      .select(col("o_custkey"), col("o_orderkey"), col("day"),
        round(sum("o_totalprice").over(w), 2).as("sum_30d"))
      .orderBy("o_custkey", "o_orderkey")
  }

  /** q_window_dist — distribution family over order totals per status. */
  def qWindowDist(s: SparkSession, dir: String): DataFrame = {
    val w = Window.partitionBy("o_orderstatus")
      .orderBy(col("o_totalprice"), col("o_orderkey"))
    Tables.orders(s, dir)
      .select(col("o_orderstatus"), col("o_orderkey"),
        ntile(4).over(w).as("quartile"),
        // percent_rank/cume_dist are rationals k/n that can sit exactly on
        // a half-way decimal where Spark (decimal HALF_UP) and DuckDB
        // (binary round) split — floor(x·1e6)/1e6 instead (SURVEY §7.4.9)
        (floor(percent_rank().over(w) * 1e6) / 1e6).as("pct_rank"),
        (floor(cume_dist().over(w) * 1e6) / 1e6).as("cume"))
      .orderBy("o_orderstatus", "o_orderkey")
  }

  /** q_topk_per_group — top-3 orders by totalprice per customer: the
    * canonical window+filter idiom (rank pushes down; no global sort). */
  def qTopkPerGroup(s: SparkSession, dir: String): DataFrame = {
    val w = Window.partitionBy("o_custkey")
      .orderBy(col("o_totalprice").desc, col("o_orderkey"))
    Tables.orders(s, dir)
      .withColumn("rn", row_number().over(w))
      .filter(col("rn") <= 3)
      .select("o_custkey", "o_orderkey", "o_totalprice", "rn")
      .orderBy("o_custkey", "rn")
  }

  val queries: Map[String, Q] = Map(
    "q_window_rank" -> (qWindowRank _),
    "q_window_analytic" -> (qWindowAnalytic _),
    "q_window_frame_rows" -> (qWindowFrameRows _),
    "q_window_frame_range" -> (qWindowFrameRange _),
    "q_window_dist" -> (qWindowDist _),
    "q_topk_per_group" -> (qTopkPerGroup _))

  val oracle: Map[String, String] = Map(
    "q_window_rank" ->
      """SELECT o_custkey, o_orderkey,
        |  row_number() OVER w AS rn,
        |  rank() OVER w AS rnk,
        |  dense_rank() OVER w AS drnk
        |FROM orders
        |WINDOW w AS (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey)
        |ORDER BY o_custkey, o_orderkey""".stripMargin,
    "q_window_analytic" ->
      """SELECT o_custkey, o_orderkey,
        |  lag(o_totalprice, 1) OVER w AS prev_price,
        |  lead(o_totalprice, 1) OVER w AS next_price,
        |  first_value(o_totalprice) OVER wf AS first_price,
        |  last_value(o_totalprice) OVER wf AS last_price,
        |  nth_value(o_totalprice, 2) OVER wf AS second_price
        |FROM orders
        |WINDOW
        |  w AS (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey),
        |  wf AS (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
        |         ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING)
        |ORDER BY o_custkey, o_orderkey""".stripMargin,
    "q_window_frame_rows" ->
      """SELECT user_id, event_id,
        |  ROUND(SUM(value) OVER (PARTITION BY user_id ORDER BY ts, event_id
        |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW), 4)
        |    AS running_sum,
        |  ROUND(AVG(value) OVER (PARTITION BY user_id ORDER BY ts, event_id
        |    ROWS BETWEEN 2 PRECEDING AND CURRENT ROW), 4) AS mov_avg3
        |FROM events
        |ORDER BY user_id, event_id""".stripMargin,
    "q_window_frame_range" ->
      """SELECT o_custkey, o_orderkey, day,
        |  ROUND(SUM(o_totalprice) OVER (PARTITION BY o_custkey ORDER BY day
        |    RANGE BETWEEN 30 PRECEDING AND CURRENT ROW), 2) AS sum_30d
        |FROM (SELECT *, (o_orderdate::DATE - DATE '1970-01-01') AS day
        |      FROM orders)
        |ORDER BY o_custkey, o_orderkey""".stripMargin,
    "q_window_dist" ->
      """SELECT o_orderstatus, o_orderkey,
        |  ntile(4) OVER w AS quartile,
        |  floor(percent_rank() OVER w * 1e6) / 1e6 AS pct_rank,
        |  floor(cume_dist() OVER w * 1e6) / 1e6 AS cume
        |FROM orders
        |WINDOW w AS (PARTITION BY o_orderstatus
        |             ORDER BY o_totalprice, o_orderkey)
        |ORDER BY o_orderstatus, o_orderkey""".stripMargin,
    "q_topk_per_group" ->
      """SELECT o_custkey, o_orderkey, o_totalprice, rn
        |FROM (SELECT o_custkey, o_orderkey, o_totalprice,
        |        row_number() OVER (PARTITION BY o_custkey
        |          ORDER BY o_totalprice DESC, o_orderkey) AS rn
        |      FROM orders)
        |WHERE rn <= 3
        |ORDER BY o_custkey, rn""".stripMargin)
}
