package graft.relational

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.{Q, Tables}

/** Statistical-monitoring operators (SURVEY §2.4 extensions, round 7):
  * per-key z-score anomaly detection, equal-frequency quantile binning,
  * and the bivariate aggregate family (corr/covar) — the data-quality
  * dashboard queries a pipeline runs over every ingest increment.
  *
  * Scale notes (100 TB posture):
  *  - q_anomaly_zscore: per-type moments are an O(types)-row keyed
  *    aggregate broadcast back onto a second scan — the big side is never
  *    shuffled (a window over event_type would shuffle the full table to
  *    compute the same five numbers). Two scans of a columnar source beat
  *    one corpus shuffle at any scale.
  *  - q_quantile_bins: decile cutoffs come from one exact-percentile
  *    aggregate (the at-scale variant swaps in approx_percentile — same
  *    shape, sketch-mergeable), broadcast as a 9-element array; bin
  *    assignment is a per-row array probe, so the only corpus shuffle is
  *    the final ≤10-key aggregate. NO ntile: a global ntile window is a
  *    single-partition sort of the whole table — the binning must come
  *    from cutoffs, not ranks, to survive scale.
  *  - q_agg_corr: corr/covar are algebraic aggregates (sum/sum²/sum·)
  *    with map-side partial merge — one shuffle of O(groups) partials.
  */
object Stats {

  /** q_anomaly_zscore — per-event-type z-score outliers: flag events more
    * than 3 sample standard deviations above their type's mean (the
    * events.value distribution is exponential-shaped, so z > 3 is a real
    * tail, ~0.2% of rows). z is irrational (sd is a sqrt), so the 1e-6
    * floor truncation is ulp-safe (SURVEY §7.4.9). */
  def qAnomalyZscore(s: SparkSession, dir: String): DataFrame = {
    val ev = Tables.events(s, dir)
    val stats = ev.groupBy("event_type")
      .agg(avg("value").as("mu"), stddev_samp("value").as("sd"))
    ev.join(broadcast(stats), "event_type")
      .withColumn("z", (col("value") - col("mu")) / col("sd"))
      .filter(col("z") > 3.0)
      .select(col("event_id"), col("event_type"), col("value"),
        (floor(col("z") * lit(1e6)) / lit(1e6)).as("z"))
      .orderBy("event_id")
  }

  /** q_quantile_bins — equal-frequency decile binning of events.value:
    * exact decile cutoffs (one percentile aggregate), then each row probes
    * the broadcast 9-cutoff array (`bin = 1 + #cutoffs below value`) and a
    * ≤10-key aggregate reports per-bin population and bounds. min/max are
    * raw data values (order-insensitive, bit-identical across engines);
    * only the mean needs the floor discipline. */
  def qQuantileBins(s: SparkSession, dir: String): DataFrame = {
    val ev = Tables.events(s, dir)
    val cuts = ev.agg(percentile(col("value"),
      lit((1 to 9).map(_ / 10.0).toArray)).as("cuts"))
    ev.crossJoin(broadcast(cuts))
      .withColumn("bin",
        (size(expr("filter(cuts, c -> value > c)")) + 1).cast("int"))
      .groupBy("bin")
      .agg(count(lit(1)).as("n"),
        min("value").as("lo"),
        max("value").as("hi"),
        (floor(avg("value") * lit(1e6)) / lit(1e6)).as("mean_value"))
      .orderBy("bin")
  }

  /** The 100 TB variant of [[qQuantileBins]]: identical plan shape with
    * `approx_percentile` (mergeable KLL-style sketch, accuracy 10 000)
    * replacing the exact percentile for the 9 cutoffs. The downstream
    * plan — broadcast cutoff probe + ≤10-key aggregate — is unchanged,
    * which is the whole point: the swap is one aggregate function, not a
    * re-architecture. Not registered as a query key (sketch cutoffs are
    * engine-specific, no DuckDB oracle); ApproxSpec pins each bin's
    * population within 2% of exact row share and PlanSpec pins the
    * shared no-Window/no-SMJ plan shape. */
  private[graft] def quantileBinsApprox(s: SparkSession, dir: String)
      : DataFrame = {
    val ev = Tables.events(s, dir)
    val cuts = ev.agg(approx_percentile(col("value"),
      lit((1 to 9).map(_ / 10.0).toArray), lit(10000)).as("cuts"))
    ev.crossJoin(broadcast(cuts))
      .withColumn("bin",
        (size(expr("filter(cuts, c -> value > c)")) + 1).cast("int"))
      .groupBy("bin")
      .agg(count(lit(1)).as("n"),
        min("value").as("lo"),
        max("value").as("hi"),
        (floor(avg("value") * lit(1e6)) / lit(1e6)).as("mean_value"))
      .orderBy("bin")
  }

  /** q_agg_corr — bivariate aggregate family per group: Pearson
    * correlation and sample/population covariance of (quantity, price) by
    * return flag. All three are algebraic (one pass, partial-mergeable);
    * outputs rounded at 4 dp like the q_agg_stats moments. The `+ 0.0`
    * after each round is the IEEE signed-zero normalization (−0.0 + 0.0 =
    * +0.0): covar_pop(l_discount, l_tax) ≈ −1e-19, and after rounding one
    * engine keeps the sign bit while the other doesn't — a byte-level hash
    * mismatch on a value that prints as 0.0 (round-7 failure). Both this
    * query and the oracle apply the same normalization. */
  def qAggCorr(s: SparkSession, dir: String): DataFrame =
    Tables.lineitem(s, dir)
      .groupBy("l_returnflag")
      .agg(
        (round(corr("l_quantity", "l_extendedprice"), 4) + lit(0.0))
          .as("corr_qty_price"),
        (round(covar_samp("l_quantity", "l_extendedprice"), 4) + lit(0.0))
          .as("covar_samp_qp"),
        (round(covar_pop("l_discount", "l_tax"), 4) + lit(0.0))
          .as("covar_pop_dt"))
      .orderBy("l_returnflag")

  /** q_agg_regr — linear-regression aggregate family per group: slope,
    * intercept, R², n of price ~ quantity by return flag — the one-pass
    * algebraic regression (sums of x, y, xy, x²) that at scale replaces a
    * collect-and-fit; rounded 4 dp like the other moment aggregates. */
  def qAggRegr(s: SparkSession, dir: String): DataFrame =
    Tables.lineitem(s, dir)
      .groupBy("l_returnflag")
      .agg(
        round(regr_slope(col("l_extendedprice"), col("l_quantity")), 4)
          .as("slope"),
        round(regr_intercept(col("l_extendedprice"), col("l_quantity")), 4)
          .as("intercept"),
        round(regr_r2(col("l_extendedprice"), col("l_quantity")), 4)
          .as("r2"),
        regr_count(col("l_extendedprice"), col("l_quantity")).as("n"))
      .orderBy("l_returnflag")

  /** q_funnel_steps — strict-order conversion funnel over the event
    * stream: per user, first view, then first click AFTER that view, then
    * first purchase AFTER that click; emits per-stage user counts and the
    * total stage-transition delay. Delays are summed as EXACT epoch
    * microseconds (bigint) — never averaged doubles, so the oracle compare
    * has no float-order surface at all. Scale shape: three user-keyed
    * aggregates chained by user-keyed joins — each stage's input shrinks
    * to the users who survived the previous stage; everything shuffles on
    * the same key (one partitioning reused), nothing broadcasts but the
    * final 3-row union. */
  def qFunnelSteps(s: SparkSession, dir: String): DataFrame = {
    val ev = Tables.events(s, dir)
      .select(col("user_id"), col("event_type"), col("ts"))
    val v = ev.filter(col("event_type") === "view")
      .groupBy("user_id").agg(min("ts").as("t1"))
    val c = ev.filter(col("event_type") === "click")
      .join(v, "user_id").filter(col("ts") > col("t1"))
      .groupBy("user_id").agg(min("ts").as("t2"), min("t1").as("t1k"))
    val p = ev.filter(col("event_type") === "purchase")
      .join(c, "user_id").filter(col("ts") > col("t2"))
      .groupBy("user_id").agg(min("ts").as("t3"), min("t2").as("t2k"))
    val s1 = v.agg(lit("1_view").as("stage"),
      count(lit(1)).as("n_users"), lit(null).cast("long").as("delay_us"))
    val s2 = c.agg(lit("2_click").as("stage"), count(lit(1)).as("n_users"),
      sum(unix_micros(col("t2")) - unix_micros(col("t1k"))).as("delay_us"))
    val s3 = p.agg(lit("3_purchase").as("stage"),
      count(lit(1)).as("n_users"),
      sum(unix_micros(col("t3")) - unix_micros(col("t2k"))).as("delay_us"))
    s1.unionByName(s2).unionByName(s3).orderBy("stage")
  }

  /** q_retention_cohort — cohort retention matrix: users grouped by
    * first-activity day (cohort), counted distinct in each later day
    * offset — the engagement report every event pipeline ships. Day
    * granularity means every value is an exact count on an exact date
    * grid (no float surface). Scale shape: one user-keyed agg for
    * cohorts, one user-keyed join back (same partitioning), one
    * (cohort, offset)-keyed distinct count. */
  def qRetentionCohort(s: SparkSession, dir: String): DataFrame = {
    val ev = Tables.events(s, dir)
      .select(col("user_id"), to_date(col("ts")).as("d"))
    val cohort = ev.groupBy("user_id").agg(min("d").as("cohort_day"))
    ev.join(cohort, "user_id")
      .withColumn("day_offset", datediff(col("d"), col("cohort_day")))
      .groupBy("cohort_day", "day_offset")
      .agg(countDistinct(col("user_id")).as("n_users"))
      .orderBy("cohort_day", "day_offset")
  }

  /** q_profile_table — single-sweep column profiler over lineitem's
    * numeric measures: per column, non-null / null / exact-distinct
    * counts, min, max, mean. The standard pre-training data-quality
    * audit ("is this column degenerate / full of nulls / constant?")
    * as ONE operator instead of n_cols ad-hoc queries.
    *
    * Shape: a single global aggregate computes all 6 stats × 4 columns
    * (24 agg expressions, all partial-merge algebraic except the exact
    * distincts), then a 4-row stack unpivots the one result row into
    * (column, stats) long form — the unpivot touches 1 row, not the
    * corpus. Scale: count/min/max/avg partial-aggregate map-side in one
    * pass; the n exact COUNT(DISTINCT)s make Catalyst Expand the scan
    * n_distinct-ways (the profiled row count multiplies by the number of
    * distinct-counted columns). At 100 TB swap them for
    * approx_count_distinct — single-pass, mergeable HLL, same output
    * schema — and the whole profile is literally one scan; exact
    * distincts are kept here because they are what DuckDB can verify. */
  def qProfileTable(s: SparkSession, dir: String): DataFrame = {
    val cols = Seq("l_quantity", "l_extendedprice", "l_discount", "l_tax")
    // Round 21: n exact COUNT(DISTINCT)s in ONE aggregate make Catalyst
    // Expand the scan n ways (every profiled row shuffled ×4 with
    // mostly-null expansion columns). Split instead: one partial-merge
    // aggregate for the algebraic stats + one single-column distinct
    // aggregate per profiled column, cross-joined as 1-row frames. Same
    // output values; each distinct subtree scans ONE column
    // (column-pruned — total column I/O equals the old single scan) and
    // shuffles a narrow distinct stream instead of the ×4 Expand. The
    // independent subtrees also schedule concurrently.
    val baseAggs = cols.flatMap { c =>
      Seq(count(col(c)).as(s"${c}_n"),
        count(lit(1)).minus(count(col(c))).as(s"${c}_nulls"),
        min(col(c)).as(s"${c}_min"),
        max(col(c)).as(s"${c}_max"),
        round(avg(col(c)), 6).as(s"${c}_avg"))
    }
    val base = Tables.lineitem(s, dir).agg(baseAggs.head, baseAggs.tail: _*)
    val one = cols.foldLeft(base) { (acc, c) =>
      acc.crossJoin(Tables.lineitem(s, dir).select(c)
        .agg(countDistinct(col(c)).as(s"${c}_dist")))
    }
    val stackExpr = cols.map(c =>
      s"'$c', ${c}_n, ${c}_nulls, ${c}_dist, ${c}_min, ${c}_max, ${c}_avg")
      .mkString(s"stack(${cols.size}, ", ", ",
        ") AS (column_name, n_non_null, n_null, n_distinct, min_val, " +
          "max_val, avg_val)")
    one.selectExpr(stackExpr).orderBy("column_name")
  }

  /** The 100 TB variant of [[qProfileTable]]: identical output schema
    * with `approx_count_distinct` (mergeable HLL, rsd 0.02) replacing
    * the exact distincts — which removes the multi-distinct Expand
    * entirely, so the whole profile is ONE scan + one partial-merge
    * aggregate. Registered as q_profile_table_approx since round 16
    * (VERDICT r15 item 3): at 100 TB this, not the exact Expand form,
    * is the profile a user actually runs. Declared no-oracle (DuckDB
    * cannot verify HLL estimates); ApproxSpec pins each estimate within
    * 10% of the exact key's count and asserts every other stat column
    * is identical, and PlanSpec pins the no-Expand plan — together they
    * prove the swap is real, not aspirational. */
  def qProfileTableApprox(s: SparkSession, dir: String)
      : DataFrame = {
    val cols = Seq("l_quantity", "l_extendedprice", "l_discount", "l_tax")
    val aggs = cols.flatMap { c =>
      Seq(count(col(c)).as(s"${c}_n"),
        count(lit(1)).minus(count(col(c))).as(s"${c}_nulls"),
        approx_count_distinct(col(c), 0.02).as(s"${c}_dist"),
        min(col(c)).as(s"${c}_min"),
        max(col(c)).as(s"${c}_max"),
        round(avg(col(c)), 6).as(s"${c}_avg"))
    }
    val one = Tables.lineitem(s, dir).agg(aggs.head, aggs.tail: _*)
    val stackExpr = cols.map(c =>
      s"'$c', ${c}_n, ${c}_nulls, ${c}_dist, ${c}_min, ${c}_max, ${c}_avg")
      .mkString(s"stack(${cols.size}, ", ", ",
        ") AS (column_name, n_non_null, n_null, n_distinct, min_val, " +
          "max_val, avg_val)")
    one.selectExpr(stackExpr).orderBy("column_name")
  }

  val queries: Map[String, Q] = Map(
    "q_anomaly_zscore" -> (qAnomalyZscore _),
    "q_quantile_bins" -> (qQuantileBins _),
    "q_agg_corr" -> (qAggCorr _),
    "q_agg_regr" -> (qAggRegr _),
    "q_funnel_steps" -> (qFunnelSteps _),
    "q_retention_cohort" -> (qRetentionCohort _),
    "q_profile_table" -> (qProfileTable _),
    "q_profile_table_approx" -> (qProfileTableApprox _))

  val oracle: Map[String, String] = Map(
    "q_profile_table" ->
      """SELECT * FROM (
        |  SELECT 'l_quantity' AS column_name,
        |    COUNT(l_quantity) AS n_non_null,
        |    COUNT(*) - COUNT(l_quantity) AS n_null,
        |    COUNT(DISTINCT l_quantity) AS n_distinct,
        |    MIN(l_quantity) AS min_val, MAX(l_quantity) AS max_val,
        |    ROUND(AVG(l_quantity), 6) AS avg_val
        |  FROM lineitem
        |  UNION ALL
        |  SELECT 'l_extendedprice', COUNT(l_extendedprice),
        |    COUNT(*) - COUNT(l_extendedprice),
        |    COUNT(DISTINCT l_extendedprice),
        |    MIN(l_extendedprice), MAX(l_extendedprice),
        |    ROUND(AVG(l_extendedprice), 6)
        |  FROM lineitem
        |  UNION ALL
        |  SELECT 'l_discount', COUNT(l_discount),
        |    COUNT(*) - COUNT(l_discount), COUNT(DISTINCT l_discount),
        |    MIN(l_discount), MAX(l_discount), ROUND(AVG(l_discount), 6)
        |  FROM lineitem
        |  UNION ALL
        |  SELECT 'l_tax', COUNT(l_tax), COUNT(*) - COUNT(l_tax),
        |    COUNT(DISTINCT l_tax), MIN(l_tax), MAX(l_tax),
        |    ROUND(AVG(l_tax), 6)
        |  FROM lineitem)
        |ORDER BY column_name""".stripMargin,
    "q_anomaly_zscore" ->
      """WITH st AS (
        |  SELECT event_type, AVG(value) AS mu, stddev_samp(value) AS sd
        |  FROM events GROUP BY event_type)
        |SELECT event_id, e.event_type, value,
        |  FLOOR((value - mu) / sd * 1e6) / 1e6 AS z
        |FROM events e JOIN st USING (event_type)
        |WHERE (value - mu) / sd > 3.0
        |ORDER BY event_id""".stripMargin,
    "q_quantile_bins" ->
      """WITH cuts AS (
        |  SELECT quantile_cont(value,
        |    [0.1, 0.2, 0.3, 0.4, 0.5, 0.6, 0.7, 0.8, 0.9]) AS cuts
        |  FROM events),
        |b AS (
        |  SELECT CAST(len(list_filter(cuts, c -> value > c)) + 1 AS INT)
        |    AS bin, value
        |  FROM events, cuts)
        |SELECT bin, COUNT(*) AS n, MIN(value) AS lo, MAX(value) AS hi,
        |  FLOOR(AVG(value) * 1e6) / 1e6 AS mean_value
        |FROM b GROUP BY bin ORDER BY bin""".stripMargin,
    "q_agg_corr" ->
      """SELECT l_returnflag,
        |  ROUND(corr(l_quantity, l_extendedprice), 4) + 0.0
        |    AS corr_qty_price,
        |  ROUND(covar_samp(l_quantity, l_extendedprice), 4) + 0.0
        |    AS covar_samp_qp,
        |  ROUND(covar_pop(l_discount, l_tax), 4) + 0.0 AS covar_pop_dt
        |FROM lineitem GROUP BY l_returnflag
        |ORDER BY l_returnflag""".stripMargin,
    "q_agg_regr" ->
      """SELECT l_returnflag,
        |  ROUND(regr_slope(l_extendedprice, l_quantity), 4) AS slope,
        |  ROUND(regr_intercept(l_extendedprice, l_quantity), 4)
        |    AS intercept,
        |  ROUND(regr_r2(l_extendedprice, l_quantity), 4) AS r2,
        |  regr_count(l_extendedprice, l_quantity) AS n
        |FROM lineitem GROUP BY l_returnflag
        |ORDER BY l_returnflag""".stripMargin,
    "q_funnel_steps" ->
      """WITH e AS (
        |  SELECT user_id, event_type, CAST(ts AS TIMESTAMP) AS ts
        |  FROM events),
        |v AS (SELECT user_id, MIN(ts) AS t1 FROM e
        |  WHERE event_type = 'view' GROUP BY user_id),
        |c AS (SELECT e.user_id, MIN(e.ts) AS t2, MIN(t1) AS t1k
        |  FROM e JOIN v USING (user_id)
        |  WHERE event_type = 'click' AND e.ts > t1 GROUP BY e.user_id),
        |p AS (SELECT e.user_id, MIN(e.ts) AS t3, MIN(t2) AS t2k
        |  FROM e JOIN c USING (user_id)
        |  WHERE event_type = 'purchase' AND e.ts > t2 GROUP BY e.user_id)
        |SELECT '1_view' AS stage, COUNT(*) AS n_users,
        |  NULL::BIGINT AS delay_us FROM v
        |UNION ALL
        |SELECT '2_click', COUNT(*),
        |  SUM(epoch_us(t2) - epoch_us(t1k))::BIGINT FROM c
        |UNION ALL
        |SELECT '3_purchase', COUNT(*),
        |  SUM(epoch_us(t3) - epoch_us(t2k))::BIGINT FROM p
        |ORDER BY stage""".stripMargin,
    "q_retention_cohort" ->
      """WITH e AS (
        |  SELECT user_id, CAST(ts AS DATE) AS d FROM events),
        |cohort AS (
        |  SELECT user_id, MIN(d) AS cohort_day FROM e GROUP BY user_id)
        |SELECT cohort_day,
        |  CAST(date_diff('day', cohort_day, d) AS INT) AS day_offset,
        |  COUNT(DISTINCT e.user_id) AS n_users
        |FROM e JOIN cohort USING (user_id)
        |GROUP BY 1, 2
        |ORDER BY cohort_day, day_offset""".stripMargin)
}
