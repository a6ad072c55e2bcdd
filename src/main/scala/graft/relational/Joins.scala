package graft.relational

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.{Q, Tables}

/** Join operators (SURVEY §2.3).
  *
  * Scale notes (100 TB posture):
  *  - Equi-joins shuffle both sides on the key (sort-merge) unless one side
  *    fits the broadcast threshold; AQE flips SMJ→BHJ at runtime from
  *    observed sizes. Dimension tables (region/nation/part/supplier/
  *    customer) stay broadcast-able at every sf; q_join_broadcast pins the
  *    hint explicitly to show the intended plan.
  *  - q_join_theta keeps an equi-conjunct (p_brand) so Catalyst plans a
  *    hash join with the inequality as a post-join residual — NOT a
  *    nested-loop over the full cross product. Per-brand fan-out is the
  *    only blow-up axis, bounded by brand cardinality (25).
  *  - q_join_interval turns a range predicate into an equi-join on the
  *    hour bucket (date_trunc) — the 100 TB-safe rewrite of interval joins.
  *  - q_join_cross is intentionally tiny (region × nation, 125 rows);
  *    cartesian products over large sides are forbidden in this codebase.
  */
object Joins {

  /** q_join_inner — inner equi-join orders ⋈ customer on custkey. */
  def qJoinInner(s: SparkSession, dir: String): DataFrame =
    Tables.orders(s, dir)
      .join(Tables.customer(s, dir),
        col("o_custkey") === col("c_custkey"), "inner")
      .select("o_orderkey", "c_custkey", "c_name", "o_totalprice")
      .orderBy("o_orderkey")

  /** q_join_broadcast — lineitem ⋈ part with part explicitly broadcast:
    * the map-side join shape that avoids shuffling the fact table. */
  def qJoinBroadcast(s: SparkSession, dir: String): DataFrame =
    Tables.lineitem(s, dir)
      .join(broadcast(Tables.part(s, dir)),
        col("l_partkey") === col("p_partkey"))
      .select("l_orderkey", "l_linenumber", "p_partkey", "p_brand")
      // (l_orderkey, l_linenumber) is not unique — include the part key
      // (p_brand is functionally dependent on it) for a total order.
      .orderBy("l_orderkey", "l_linenumber", "p_partkey")

  /** q_join_left — all customers with their orders (orderless → nulls). */
  def qJoinLeft(s: SparkSession, dir: String): DataFrame =
    Tables.customer(s, dir)
      .join(Tables.orders(s, dir),
        col("c_custkey") === col("o_custkey"), "left")
      .select("c_custkey", "c_name", "o_orderkey", "o_totalprice")
      .orderBy(col("c_custkey").asc, col("o_orderkey").asc_nulls_first)

  /** q_join_right — mirror of q_join_left via right outer join. */
  def qJoinRight(s: SparkSession, dir: String): DataFrame =
    Tables.orders(s, dir)
      .join(Tables.customer(s, dir),
        col("o_custkey") === col("c_custkey"), "right")
      .select("c_custkey", "c_name", "o_orderkey", "o_totalprice")
      .orderBy(col("c_custkey").asc, col("o_orderkey").asc_nulls_first)

  /** q_join_full — supplier ⟗ nation on nationkey (nations without
    * suppliers surface null supplier columns). */
  def qJoinFull(s: SparkSession, dir: String): DataFrame =
    Tables.supplier(s, dir)
      .join(Tables.nation(s, dir),
        col("s_nationkey") === col("n_nationkey"), "full")
      .select("n_nationkey", "n_name", "s_suppkey", "s_name")
      .orderBy(col("n_nationkey").asc_nulls_first,
        col("s_suppkey").asc_nulls_first)

  /** q_join_semi — customers having ≥1 order (EXISTS). */
  def qJoinSemi(s: SparkSession, dir: String): DataFrame =
    Tables.customer(s, dir)
      .join(Tables.orders(s, dir),
        col("c_custkey") === col("o_custkey"), "left_semi")
      .select("c_custkey", "c_name")
      .orderBy("c_custkey")

  /** q_join_anti — customers with no URGENT order (NOT EXISTS over a
    * filtered probe side). The probe is filtered to priority 1-URGENT so
    * the anti set is structurally NON-EMPTY at every harness SF
    * (18/203/1986 rows at sf0.001/0.01/0.1) — the original "no orders at
    * all" probe returned zero rows at the oracle SF, making empty==empty
    * a vacuous content check (VERDICT r17). */
  def qJoinAnti(s: SparkSession, dir: String): DataFrame =
    Tables.customer(s, dir)
      .join(Tables.orders(s, dir)
          .filter(col("o_orderpriority") === "1-URGENT"),
        col("c_custkey") === col("o_custkey"), "left_anti")
      .select("c_custkey", "c_name")
      .orderBy("c_custkey")

  /** q_join_theta — same-brand part pairs with p1.size < p2.size. The
    * brand equi-conjunct keeps this hash-based (inequality is a residual
    * filter), bounding cost to per-brand fan-out. */
  def qJoinTheta(s: SparkSession, dir: String): DataFrame = {
    val p1 = Tables.part(s, dir)
      .select(col("p_partkey").as("k1"), col("p_brand").as("brand"),
        col("p_size").as("size1"))
    val p2 = Tables.part(s, dir)
      .select(col("p_partkey").as("k2"), col("p_brand").as("brand2"),
        col("p_size").as("size2"))
    p1.join(p2, col("brand") === col("brand2") && col("size1") < col("size2"))
      .select("k1", "k2", "brand", "size1", "size2")
      .orderBy("k1", "k2")
  }

  /** q_join_cross — cartesian region × nation (bounded: 5 × 25). */
  def qJoinCross(s: SparkSession, dir: String): DataFrame =
    Tables.region(s, dir).select("r_name")
      .crossJoin(Tables.nation(s, dir).select("n_name"))
      .orderBy("r_name", "n_name")

  /** q_join_interval — events assigned to hour buckets: the range
    * predicate ts ∈ [bucket, bucket+1h) rewritten as an equi-join on
    * date_trunc('hour', ts), then aggregated per bucket. */
  def qJoinInterval(s: SparkSession, dir: String): DataFrame = {
    val ev = Tables.events(s, dir)
      .withColumn("bucket_start", date_trunc("hour", col("ts")))
    val buckets = ev.select("bucket_start").distinct()
    buckets.join(ev, Seq("bucket_start"))
      .groupBy("bucket_start")
      .agg(count(lit(1)).as("n_events"),
        round(sum("value"), 2).as("sum_value"))
      .orderBy("bucket_start")
  }

  /** q_join_asof — for each 'click' event, the latest 'purchase' by the
    * same user at ts ≤ click ts (left: clicks without a prior purchase
    * keep nulls). Spark has no native as-of join; this is the
    * union+window form: tag both sides, order (user, ts, side, id), carry
    * the last non-null build row forward, keep probe rows. One shuffle on
    * the key, O(n log n) partition-local sort — the same shape pandas-on-
    * Spark's merge_asof lowers to, and 100 TB-safe (no range cross join).
    * At equal timestamps the build side sorts first, so ties match
    * (≤ semantics); among equal-ts builds the max event_id wins. */
  def qJoinAsof(s: SparkSession, dir: String): DataFrame = {
    val ev = Tables.events(s, dir)
    val purchases = ev.filter(col("event_type") === "purchase")
      .select(col("user_id"), col("ts"), col("event_id"),
        lit(null).cast("long").as("probe_id"),
        col("event_id").as("p_id"), col("value").as("p_value"),
        lit(0).as("side"))
    val clicks = ev.filter(col("event_type") === "click")
      .select(col("user_id"), col("ts"), col("event_id"),
        col("event_id").as("probe_id"),
        lit(null).cast("long").as("p_id"),
        lit(null).cast("double").as("p_value"),
        lit(1).as("side"))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy("user_id")
      .orderBy(col("ts"), col("side"), col("event_id"))
      .rowsBetween(org.apache.spark.sql.expressions.Window.unboundedPreceding,
        org.apache.spark.sql.expressions.Window.currentRow)
    purchases.unionByName(clicks)
      .withColumn("m_id", last(col("p_id"), ignoreNulls = true).over(w))
      .withColumn("m_value", last(col("p_value"), ignoreNulls = true).over(w))
      .filter(col("side") === 1)
      .select(col("probe_id"), col("user_id"), col("ts"),
        col("m_id"), col("m_value"))
      .orderBy("probe_id")
  }

  /** q_join_asof_native — the SAME as-of semantics as q_join_asof, but
    * through graft's whole-operator custom plan (graft.plans.AsOfJoin:
    * logical node + pushdown Rule + SparkStrategy + partition-sorted
    * streaming-merge SparkPlan) instead of the union+window encoding.
    * Oracle identical to q_join_asof — the two keys must hash-match each
    * other forever, which is the strongest cross-check the harness can
    * express for a custom operator. See AsOfJoin.scala for why the native
    * shape wins at scale (narrow per-side shuffles, O(1) merge state, no
    * window buffer). */
  def qJoinAsofNative(s: SparkSession, dir: String): DataFrame = {
    val ev = Tables.events(s, dir)
    val clicks = ev.filter(col("event_type") === "click")
      .select(col("event_id").as("probe_id"), col("user_id"), col("ts"))
    val purchases = ev.filter(col("event_type") === "purchase")
      .select(col("user_id").as("b_user"), col("ts").as("b_ts"),
        col("event_id").as("m_id"), col("value").as("m_value"))
    graft.plans.AsOf.asof(clicks, purchases,
      probeKey = "user_id", buildKey = "b_user",
      probeTime = "ts", buildTime = "b_ts", tieBreak = Seq("m_id"))
      .select("probe_id", "user_id", "ts", "m_id", "m_value")
      .orderBy("probe_id")
  }

  /** q_join_asof_fwd — forward as-of through the same custom operator:
    * for each click, the NEXT purchase by the same user at ts ≥ click ts
    * (ties: at equal ts the purchase matches; among equal-ts purchases
    * the MIN event_id wins — the forward mirror of q_join_asof's rules).
    * The "time to next conversion" query. Same plan shape; the merge
    * retains nothing at all (the pending head IS the match). */
  def qJoinAsofFwd(s: SparkSession, dir: String): DataFrame = {
    val ev = Tables.events(s, dir)
    val clicks = ev.filter(col("event_type") === "click")
      .select(col("event_id").as("probe_id"), col("user_id"), col("ts"))
    val purchases = ev.filter(col("event_type") === "purchase")
      .select(col("user_id").as("b_user"), col("ts").as("b_ts"),
        col("event_id").as("m_id"), col("value").as("m_value"))
    graft.plans.AsOf.asof(clicks, purchases,
      probeKey = "user_id", buildKey = "b_user",
      probeTime = "ts", buildTime = "b_ts", tieBreak = Seq("m_id"),
      forward = true)
      .select("probe_id", "user_id", "ts", "m_id", "m_value")
      .orderBy("probe_id")
  }

  /** q_join_star — the canonical shipping-priority star query (TPC-H Q3
    * shape, round 7): filtered customer segment ⋈ orders ⋈ lineitem,
    * top-10 open orders by outstanding revenue. Declared fully
    * declaratively: all three filters push to the parquet scans, Catalyst
    * reorders the joins by estimated size, and AQE swaps in broadcast
    * sides at runtime where a filtered dim collapses — at 100 TB both
    * joins become shuffled hash/SMJ on (custkey, orderkey) with nothing
    * to hand-tune; the revenue grid is 2dp × 2dp, so round(4) is exact on
    * both engines (q_agg_hash precedent). */
  def qJoinStar(s: SparkSession, dir: String): DataFrame = {
    val cutoff = lit("1998-01-01").cast("timestamp")
    val c = Tables.customer(s, dir)
      .filter(col("c_mktsegment") === "BUILDING").select("c_custkey")
    val o = Tables.orders(s, dir).filter(col("o_orderdate") < cutoff)
      .select("o_orderkey", "o_custkey", "o_orderdate", "o_orderpriority")
    val l = Tables.lineitem(s, dir).filter(col("l_shipdate") > cutoff)
      .select("l_orderkey", "l_extendedprice", "l_discount")
    l.join(o, col("l_orderkey") === col("o_orderkey"))
      .join(c, col("o_custkey") === col("c_custkey"))
      .groupBy("o_orderkey", "o_orderdate", "o_orderpriority")
      .agg(round(sum(col("l_extendedprice") * (lit(1) - col("l_discount"))),
        4).as("revenue"))
      .orderBy(desc("revenue"), col("o_orderkey"))
      .limit(10)
  }

  val queries: Map[String, Q] = Map(
    "q_join_star" -> (qJoinStar _),
    "q_join_asof" -> (qJoinAsof _),
    "q_join_asof_native" -> (qJoinAsofNative _),
    "q_join_asof_fwd" -> (qJoinAsofFwd _),
    "q_join_inner" -> (qJoinInner _),
    "q_join_broadcast" -> (qJoinBroadcast _),
    "q_join_left" -> (qJoinLeft _),
    "q_join_right" -> (qJoinRight _),
    "q_join_full" -> (qJoinFull _),
    "q_join_semi" -> (qJoinSemi _),
    "q_join_anti" -> (qJoinAnti _),
    "q_join_theta" -> (qJoinTheta _),
    "q_join_cross" -> (qJoinCross _),
    "q_join_interval" -> (qJoinInterval _))

  val oracle: Map[String, String] = Map(
    "q_join_star" ->
      """SELECT o_orderkey, o_orderdate, o_orderpriority,
        |  ROUND(SUM(l_extendedprice * (1 - l_discount)), 4) AS revenue
        |FROM customer
        |JOIN orders ON o_custkey = c_custkey
        |JOIN lineitem ON l_orderkey = o_orderkey
        |WHERE c_mktsegment = 'BUILDING'
        |  AND o_orderdate < TIMESTAMP '1998-01-01'
        |  AND l_shipdate > TIMESTAMP '1998-01-01'
        |GROUP BY o_orderkey, o_orderdate, o_orderpriority
        |ORDER BY revenue DESC, o_orderkey
        |LIMIT 10""".stripMargin,
    // tie-explicit window form rather than DuckDB's native ASOF JOIN:
    // ASOF leaves the choice among equal-timestamp purchases unspecified,
    // while this mirrors the Spark query's (ts, side, event_id) order
    // exactly (max event_id wins a tie) — so the compare is not
    // data-dependent on (user_id, ts) purchase uniqueness (ADVICE r2)
    "q_join_asof" ->
      """WITH tagged AS (
        |  SELECT user_id, ts, event_id, NULL::BIGINT AS probe_id,
        |    event_id AS p_id, value AS p_value, 0 AS side
        |  FROM events WHERE event_type = 'purchase'
        |  UNION ALL
        |  SELECT user_id, ts, event_id, event_id AS probe_id,
        |    NULL::BIGINT AS p_id, NULL::DOUBLE AS p_value, 1 AS side
        |  FROM events WHERE event_type = 'click'),
        |m AS (
        |  SELECT *,
        |    last_value(p_id IGNORE NULLS) OVER w AS m_id,
        |    last_value(p_value IGNORE NULLS) OVER w AS m_value
        |  FROM tagged
        |  WINDOW w AS (PARTITION BY user_id ORDER BY ts, side, event_id
        |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW))
        |SELECT probe_id, user_id, ts, m_id, m_value
        |FROM m WHERE side = 1
        |ORDER BY probe_id""".stripMargin,
    // the native custom-operator twin must produce byte-identical output
    // to the window form — same oracle, strongest possible cross-check
    "q_join_asof_native" ->
      """WITH tagged AS (
        |  SELECT user_id, ts, event_id, NULL::BIGINT AS probe_id,
        |    event_id AS p_id, value AS p_value, 0 AS side
        |  FROM events WHERE event_type = 'purchase'
        |  UNION ALL
        |  SELECT user_id, ts, event_id, event_id AS probe_id,
        |    NULL::BIGINT AS p_id, NULL::DOUBLE AS p_value, 1 AS side
        |  FROM events WHERE event_type = 'click'),
        |m AS (
        |  SELECT *,
        |    last_value(p_id IGNORE NULLS) OVER w AS m_id,
        |    last_value(p_value IGNORE NULLS) OVER w AS m_value
        |  FROM tagged
        |  WINDOW w AS (PARTITION BY user_id ORDER BY ts, side, event_id
        |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW))
        |SELECT probe_id, user_id, ts, m_id, m_value
        |FROM m WHERE side = 1
        |ORDER BY probe_id""".stripMargin,
    // forward mirror: scan DESC so "last non-null purchase so far" is the
    // SMALLEST ts ≥ the click's; side ASC keeps equal-ts purchases before
    // clicks (≥ matches), event_id DESC makes the min event_id win ties
    "q_join_asof_fwd" ->
      """WITH tagged AS (
        |  SELECT user_id, ts, event_id, NULL::BIGINT AS probe_id,
        |    event_id AS p_id, value AS p_value, 0 AS side
        |  FROM events WHERE event_type = 'purchase'
        |  UNION ALL
        |  SELECT user_id, ts, event_id, event_id AS probe_id,
        |    NULL::BIGINT AS p_id, NULL::DOUBLE AS p_value, 1 AS side
        |  FROM events WHERE event_type = 'click'),
        |m AS (
        |  SELECT *,
        |    last_value(p_id IGNORE NULLS) OVER w AS m_id,
        |    last_value(p_value IGNORE NULLS) OVER w AS m_value
        |  FROM tagged
        |  WINDOW w AS (PARTITION BY user_id
        |    ORDER BY ts DESC, side ASC, event_id DESC
        |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW))
        |SELECT probe_id, user_id, ts, m_id, m_value
        |FROM m WHERE side = 1
        |ORDER BY probe_id""".stripMargin,
    "q_join_inner" ->
      """SELECT o_orderkey, c_custkey, c_name, o_totalprice
        |FROM orders JOIN customer ON o_custkey = c_custkey
        |ORDER BY o_orderkey""".stripMargin,
    "q_join_broadcast" ->
      """SELECT l_orderkey, l_linenumber, p_partkey, p_brand
        |FROM lineitem JOIN part ON l_partkey = p_partkey
        |ORDER BY l_orderkey, l_linenumber, p_partkey""".stripMargin,
    "q_join_left" ->
      """SELECT c_custkey, c_name, o_orderkey, o_totalprice
        |FROM customer LEFT JOIN orders ON c_custkey = o_custkey
        |ORDER BY c_custkey ASC, o_orderkey ASC NULLS FIRST""".stripMargin,
    "q_join_right" ->
      """SELECT c_custkey, c_name, o_orderkey, o_totalprice
        |FROM orders RIGHT JOIN customer ON o_custkey = c_custkey
        |ORDER BY c_custkey ASC, o_orderkey ASC NULLS FIRST""".stripMargin,
    "q_join_full" ->
      """SELECT n_nationkey, n_name, s_suppkey, s_name
        |FROM supplier FULL JOIN nation ON s_nationkey = n_nationkey
        |ORDER BY n_nationkey ASC NULLS FIRST, s_suppkey ASC NULLS FIRST"""
        .stripMargin,
    "q_join_semi" ->
      """SELECT c_custkey, c_name FROM customer
        |WHERE EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey)
        |ORDER BY c_custkey""".stripMargin,
    "q_join_anti" ->
      """SELECT c_custkey, c_name FROM customer
        |WHERE NOT EXISTS (SELECT 1 FROM orders
        |  WHERE o_custkey = c_custkey AND o_orderpriority = '1-URGENT')
        |ORDER BY c_custkey""".stripMargin,
    "q_join_theta" ->
      """SELECT p1.p_partkey AS k1, p2.p_partkey AS k2,
        |  p1.p_brand AS brand, p1.p_size AS size1, p2.p_size AS size2
        |FROM part p1 JOIN part p2
        |  ON p1.p_brand = p2.p_brand AND p1.p_size < p2.p_size
        |ORDER BY k1, k2""".stripMargin,
    "q_join_cross" ->
      """SELECT r_name, n_name FROM region CROSS JOIN nation
        |ORDER BY r_name, n_name""".stripMargin,
    "q_join_interval" ->
      """SELECT CAST(date_trunc('hour', ts) AS TIMESTAMP) AS bucket_start,
        |  COUNT(*) AS n_events, ROUND(SUM(value), 2) AS sum_value
        |FROM events
        |GROUP BY 1
        |ORDER BY bucket_start""".stripMargin)
}
