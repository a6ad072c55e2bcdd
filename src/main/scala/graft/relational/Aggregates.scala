package graft.relational

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.{Q, Tables}

/** Aggregation operators (SURVEY §2.4).
  *
  * Scale notes (100 TB posture): every grouped agg here is a partial+final
  * HashAggregate — map-side combine happens before the shuffle, so network
  * volume is O(groups), not O(rows). Group-by keys are low-cardinality
  * categorical columns, so the final agg is tiny regardless of input scale.
  * rollup/cube/grouping-sets plan as a single Expand + aggregate (one scan,
  * one shuffle, rows multiplied only by the grouping-set count).
  * approx_count_distinct is the sketch path: HLL++ partial states merge
  * associatively, shuffling O(groups · sketch), never O(distinct).
  *
  * Float determinism vs the DuckDB oracle (SURVEY §7.4.1): summation order
  * differs between engines, so every aggregated double is rounded. Rounding
  * scale is chosen so the TRUE value sits on the rounding grid (prices have
  * 2 decimals -> sums of prices are 2dp-exact -> round at 2dp is safe;
  * price*(1-disc) is 4dp-exact -> round at 4dp), keeping both engines' tiny
  * summation errors strictly inside the same bucket. sum_qty is rounded at
  * 2dp for the same reason even though quantities are integral doubles
  * (sums stay exact below 2^53) — the invariant is uniform by construction.
  * Statistical aggs use small-magnitude columns (quantity, discount) so a
  * 4dp grid dwarfs cross-engine accumulation differences.
  */
object Aggregates {

  /** q_agg_hash — TPC-H Q1 shape: the flagship grouped hash aggregate. */
  def qAggHash(s: SparkSession, dir: String): DataFrame =
    Tables.lineitem(s, dir)
      .filter(col("l_shipdate") <= lit("1998-09-02").cast("timestamp"))
      .groupBy("l_returnflag", "l_linestatus")
      .agg(
        round(sum("l_quantity"), 2).as("sum_qty"),
        round(sum("l_extendedprice"), 2).as("sum_base_price"),
        round(sum(col("l_extendedprice") * (lit(1.0) - col("l_discount"))), 4)
          .as("sum_disc_price"),
        round(avg("l_quantity"), 6).as("avg_qty"),
        round(avg("l_extendedprice"), 6).as("avg_price"),
        count(lit(1)).as("count_order"))
      .orderBy("l_returnflag", "l_linestatus")

  /** q_agg_hash_decimal — the Q1 shape again, but on DecimalType measures
    * (SURVEY §1.2 declares decimals in scope; this is the key that
    * exercises them end-to-end). The harness columns are doubles whose
    * values all carry ≤2 decimal digits (verified over all 60k sf0.01
    * rows), so cast(double → DECIMAL(12,2)) is value-exact on both
    * engines and every downstream sum is exact integer-scaled
    * arithmetic — no float summation-order rounding needed at all, which
    * is precisely why 100 TB money pipelines use decimals. Sums are cast
    * to fixed DECIMAL(18,_) so Spark's widened result precision
    * (decimal(22,2)) and DuckDB's (decimal(38,2)) land on the same
    * output type. avg is deliberately omitted: decimal division rounds
    * HALF_UP in Spark but returns DOUBLE in DuckDB — not comparable.
    *
    * Final projections are cast DECIMAL → DOUBLE on BOTH engines (round-4
    * verdict): the driver hashes the Spark parquet via pyarrow (Python
    * `Decimal` cells) but the DuckDB oracle via `.df()` (float64 cells),
    * so identical values hash-mismatch at the type level. The real
    * invariant (round-5 advice): a decimal with nonzero fraction is
    * generally NOT exactly representable as a double — the hash matches
    * because both engines produce the same correctly-rounded double,
    * which holds while the unscaled DECIMAL(18,2) value stays < 2^53
    * (DuckDB computes double(unscaled)/double(10^scale), which can
    * double-round apart from Spark's cast past that bound). Harness sums
    * are orders of magnitude below it; re-check before scaling up. The
    * decimal arithmetic — the thing this key exercises — stays internal. */
  def qAggHashDecimal(s: SparkSession, dir: String): DataFrame = {
    val li = Tables.lineitem(s, dir)
      .filter(col("l_shipdate") <= lit("1998-09-02").cast("timestamp"))
      .select(col("l_returnflag"), col("l_linestatus"),
        col("l_quantity").cast("decimal(12,2)").as("qty"),
        col("l_extendedprice").cast("decimal(12,2)").as("price"),
        col("l_discount").cast("decimal(12,2)").as("disc"))
    li.groupBy("l_returnflag", "l_linestatus")
      .agg(
        sum("qty").cast("decimal(18,2)").cast("double").as("sum_qty"),
        sum("price").cast("decimal(18,2)").cast("double")
          .as("sum_base_price"),
        sum(col("price") * (lit(BigDecimal("1.00")) - col("disc")))
          .cast("decimal(18,4)").cast("double").as("sum_disc_price"),
        min("price").cast("decimal(18,2)").cast("double").as("min_price"),
        max("price").cast("decimal(18,2)").cast("double").as("max_price"),
        count(lit(1)).as("count_order"))
      .orderBy("l_returnflag", "l_linestatus")
  }

  /** q_agg_global — ungrouped min/max/count/sum over lineitem. */
  def qAggGlobal(s: SparkSession, dir: String): DataFrame =
    Tables.lineitem(s, dir)
      .agg(
        count(lit(1)).as("n_rows"),
        round(sum("l_extendedprice"), 2).as("sum_price"),
        min("l_extendedprice").as("min_price"),
        max("l_extendedprice").as("max_price"),
        min("l_shipdate").as("min_shipdate"),
        max("l_shipdate").as("max_shipdate"))

  /** q_agg_distinct — distinct aggregates per returnflag (Catalyst expands
    * to a two-phase agg via RewriteDistinctAggregates). */
  def qAggDistinct(s: SparkSession, dir: String): DataFrame =
    Tables.lineitem(s, dir)
      .groupBy("l_returnflag")
      .agg(
        countDistinct(col("l_partkey")).as("cnt_parts"),
        round(sum_distinct(col("l_quantity")), 2).as("sum_dist_qty"))
      .orderBy("l_returnflag")

  /** Shared shape for rollup/cube: subtotal nulls are coalesced to a
    * sentinel so ordering is deterministic and dialect-independent. */
  private def subtotals(g: org.apache.spark.sql.RelationalGroupedDataset) = g
    .agg(count(lit(1)).as("cnt"), round(sum("o_totalprice"), 2).as("sum_price"))
    .select(
      coalesce(col("o_orderstatus"), lit("_ALL_")).as("status"),
      coalesce(col("o_orderpriority"), lit("_ALL_")).as("priority"),
      col("cnt"), col("sum_price"))
    .orderBy("status", "priority")

  /** q_agg_rollup — subtotal hierarchy over (status, priority). */
  def qAggRollup(s: SparkSession, dir: String): DataFrame =
    subtotals(Tables.orders(s, dir).rollup("o_orderstatus", "o_orderpriority"))

  /** q_agg_cube — full cube over (status, priority). */
  def qAggCube(s: SparkSession, dir: String): DataFrame =
    subtotals(Tables.orders(s, dir).cube("o_orderstatus", "o_orderpriority"))

  /** q_agg_grouping_sets — explicit sets ((status),(priority),()). */
  def qAggGroupingSets(s: SparkSession, dir: String): DataFrame = {
    Tables.orders(s, dir).createOrReplaceTempView("orders_gs")
    s.sql(
      """SELECT COALESCE(o_orderstatus, '_ALL_') AS status,
        |  COALESCE(o_orderpriority, '_ALL_') AS priority,
        |  COUNT(1) AS cnt, ROUND(SUM(o_totalprice), 2) AS sum_price
        |FROM orders_gs
        |GROUP BY GROUPING SETS ((o_orderstatus), (o_orderpriority), ())
        |ORDER BY status, priority""".stripMargin)
  }

  /** q_agg_approx_distinct — HLL++ sketch distinct per returnflag. No
    * oracle (Spark's HLL ≠ DuckDB's bit-for-bit); the scalatest suite
    * asserts ±2% of exact instead. This is the 100 TB path for distinct
    * counts — mergeable O(kB) sketches instead of an O(distinct) shuffle. */
  def qAggApproxDistinct(s: SparkSession, dir: String): DataFrame =
    Tables.lineitem(s, dir)
      .groupBy("l_returnflag")
      .agg(approx_count_distinct(col("l_partkey"), 0.01).as("approx_parts"))
      .orderBy("l_returnflag")

  /** q_agg_approx_percentile — approximate percentiles via Spark's
    * quantile sketch (added round 3): the 100 TB twin of
    * q_agg_percentile, exactly as q_agg_approx_distinct is of
    * q_agg_distinct — a mergeable bounded-size sketch per partition
    * instead of a per-group sort. No oracle (sketch internals are
    * engine-specific); the scalatest suite asserts relative error vs the
    * exact percentiles. */
  def qAggApproxPercentile(s: SparkSession, dir: String): DataFrame =
    Tables.lineitem(s, dir)
      .groupBy("l_returnflag")
      .agg(percentile_approx(col("l_extendedprice"),
        array(lit(0.25), lit(0.5), lit(0.75)), lit(10000)).as("pcts"))
      .select(col("l_returnflag"),
        round(element_at(col("pcts"), 1), 2).as("p25"),
        round(element_at(col("pcts"), 2), 2).as("p50"),
        round(element_at(col("pcts"), 3), 2).as("p75"))
      .orderBy("l_returnflag")

  /** q_agg_percentile — exact interpolated percentiles + median per
    * returnflag. 2dp inputs at quarter interpolation points sit on a 4dp
    * grid, so round(4) is exact on both engines. */
  def qAggPercentile(s: SparkSession, dir: String): DataFrame =
    Tables.lineitem(s, dir)
      .groupBy("l_returnflag")
      .agg(
        round(percentile(col("l_extendedprice"), lit(0.25)), 4).as("p25"),
        round(percentile(col("l_extendedprice"), lit(0.5)), 4).as("p50"),
        round(percentile(col("l_extendedprice"), lit(0.75)), 4).as("p75"),
        round(median(col("l_quantity")), 4).as("med_qty"))
      .orderBy("l_returnflag")

  /** q_agg_stats — statistical aggregates on small-magnitude columns
    * (quantity ~[1,50], discount ~[0,0.1]) so the 4dp grid absorbs
    * cross-engine accumulation-order noise. */
  def qAggStats(s: SparkSession, dir: String): DataFrame =
    Tables.lineitem(s, dir)
      .groupBy("l_returnflag")
      .agg(
        round(stddev_samp(col("l_quantity")), 4).as("sd_qty"),
        round(var_samp(col("l_quantity")), 4).as("var_qty"),
        round(corr(col("l_quantity"), col("l_discount")), 4).as("corr_qd"),
        round(covar_samp(col("l_quantity"), col("l_discount")), 4)
          .as("cov_qd"))
      .orderBy("l_returnflag")

  /** q_agg_collect — collection aggregates; lists are sorted because
    * collect order is partitioning-dependent (SURVEY §7.4.3), and emitted
    * as joined strings because the driver's row compare sorts values and
    * cannot order raw array cells (round-2 finding: its pandas sort dies
    * on ndarray columns). */
  def qAggCollect(s: SparkSession, dir: String): DataFrame =
    Tables.supplier(s, dir)
      .join(Tables.nation(s, dir), col("s_nationkey") === col("n_nationkey"))
      .groupBy("n_name")
      .agg(
        array_join(sort_array(collect_list(col("s_name"))), "|")
          .as("suppliers"),
        array_join(transform(sort_array(collect_set(col("s_nationkey"))),
          _.cast("string")), ",").as("nationkeys"))
      .orderBy("n_name")

  /** q_pivot — rows=orderpriority, cols=orderstatus (pinned value list),
    * cells=order count; missing cells coalesced to 0 to match the oracle's
    * conditional-count form. */
  def qPivot(s: SparkSession, dir: String): DataFrame =
    Tables.orders(s, dir)
      .groupBy("o_orderpriority")
      .pivot("o_orderstatus", Seq("F", "O", "P"))
      .count()
      .select(
        col("o_orderpriority"),
        coalesce(col("F"), lit(0L)).as("F"),
        coalesce(col("O"), lit(0L)).as("O"),
        coalesce(col("P"), lit(0L)).as("P"))
      .orderBy("o_orderpriority")

  /** q_stats_histogram — fixed-width histogram with empty-bucket
    * densification (round 7): events.value bucketed at width 25 over
    * [0, 500), edge-clamped so every row lands in a bucket, then
    * LEFT-joined from the full bucket domain so empty buckets appear with
    * zero counts — the densification a plotting/monitoring consumer needs
    * (a bare GROUP BY silently drops empty buckets). Scale shape: one
    * keyed partial aggregate over ≤20 keys; the domain side is a
    * 20-row range, so the densify join is a broadcast no-op. */
  def qStatsHistogram(s: SparkSession, dir: String): DataFrame = {
    val W = 25
    val buckets = s.range(20).select(col("id").cast("int").as("bucket"))
    val counts = Tables.events(s, dir)
      .withColumn("bucket",
        least(greatest(floor(col("value") / W), lit(0)), lit(19)).cast("int"))
      .groupBy("bucket")
      .agg(count(lit(1)).as("n"), round(sum("value"), 2).as("sum_value"))
    buckets.join(counts, Seq("bucket"), "left")
      .select(col("bucket"),
        (col("bucket") * W).cast("double").as("lo"),
        ((col("bucket") + 1) * W).cast("double").as("hi"),
        coalesce(col("n"), lit(0L)).as("n"),
        coalesce(col("sum_value"), lit(0.0)).as("sum_value"))
      .orderBy("bucket")
  }

  /** q_agg_sketch_hll — mergeable Datasketches HLL distinct-count
    * (round 7): per-(event_type, half) partial sketches are built with
    * `hll_sketch_agg`, then MERGED across the halves with `hll_union_agg`
    * and estimated. The halves simulate independent pipeline runs (daily
    * increments, per-datacenter jobs): unlike approx_count_distinct —
    * whose sketch dies inside the query — these sketches are binary
    * VALUES a 100 TB pipeline stores per partition and re-merges forever
    * after without rescanning history. No oracle (DuckDB's HLL is a
    * different implementation); ApproxSpec asserts the merged estimate
    * equals the single-pass sketch exactly and tracks exact distinct
    * counts within 5%. */
  def qAggSketchHll(s: SparkSession, dir: String): DataFrame =
    Tables.events(s, dir)
      .groupBy(col("event_type"), (col("event_id") % 2).as("half"))
      .agg(hll_sketch_agg(col("user_id"), lit(12)).as("sk"))
      .groupBy("event_type")
      .agg(hll_sketch_estimate(hll_union_agg(col("sk"), lit(false)))
        .as("n_users_est"))
      .orderBy("event_type")

  /** q_agg_sketch_persist — the PERSISTED half of the sketch story
    * (round 11): [[qAggSketchHll]] merges partials inside one query;
    * this key closes the cross-run loop the way q_dedup_manifest_update
    * does for dedup. Per-(event_type, day) HLL sketches are written to
    * parquet (binary sketch state — the pre-aggregated artifact a 100 TB
    * pipeline stores per partition-day), READ BACK, and re-aggregated to
    * per-type totals with `hll_union_agg` — history is never rescanned:
    * day N's raw events are touched once ever, and every later rollup
    * works off the compact sketch table (O(types × days × 2^lgK) bytes).
    * Output carries both the stored-partial row count and the re-merged
    * estimates. No oracle (sketch state is engine-specific); ApproxSpec
    * asserts the from-disk merge equals [[qAggSketchHll]]-style direct
    * estimates exactly and stays within 5% of exact distincts. */
  def qAggSketchPersist(s: SparkSession, dir: String): DataFrame = {
    val path = graft.Scratch.dir("sketch",
      s"hll_daily_${dir.replaceAll("[^a-zA-Z0-9]", "_")}")
    Tables.events(s, dir)
      .groupBy(col("event_type"), to_date(col("ts")).as("day"))
      .agg(hll_sketch_agg(col("user_id"), lit(12)).as("sk"))
      .write.mode("overwrite").parquet(path)
    val partials = s.read.parquet(path)
    partials
      .groupBy("event_type")
      .agg(count(lit(1)).as("n_days"),
        hll_sketch_estimate(hll_union_agg(col("sk"), lit(false)))
          .as("n_users_est"))
      .orderBy("event_type")
  }

  val queries: Map[String, Q] = Map(
    "q_agg_hash" -> (qAggHash _),
    "q_agg_hash_decimal" -> (qAggHashDecimal _),
    "q_agg_global" -> (qAggGlobal _),
    "q_agg_distinct" -> (qAggDistinct _),
    "q_agg_rollup" -> (qAggRollup _),
    "q_agg_cube" -> (qAggCube _),
    "q_agg_grouping_sets" -> (qAggGroupingSets _),
    "q_agg_approx_distinct" -> (qAggApproxDistinct _),
    "q_agg_approx_percentile" -> (qAggApproxPercentile _),
    "q_agg_percentile" -> (qAggPercentile _),
    "q_agg_stats" -> (qAggStats _),
    "q_agg_collect" -> (qAggCollect _),
    "q_pivot" -> (qPivot _),
    "q_stats_histogram" -> (qStatsHistogram _),
    "q_agg_sketch_hll" -> (qAggSketchHll _),
    "q_agg_sketch_persist" -> (qAggSketchPersist _))

  val oracle: Map[String, String] = Map(
    // q_agg_sketch_hll: no oracle — DuckDB's HLL is a different sketch
    // implementation; verified in ApproxSpec (merge==direct, ≤5% vs exact)
    "q_stats_histogram" ->
      """WITH c AS (
        |  SELECT CAST(LEAST(GREATEST(FLOOR(value / 25), 0), 19) AS INT)
        |    AS bucket,
        |    COUNT(*) AS n, ROUND(SUM(value), 2) AS sum_value
        |  FROM events GROUP BY 1)
        |SELECT b.bucket, (b.bucket * 25)::DOUBLE AS lo,
        |  ((b.bucket + 1) * 25)::DOUBLE AS hi,
        |  COALESCE(c.n, 0) AS n,
        |  COALESCE(c.sum_value, 0.0) AS sum_value
        |FROM (SELECT b::INT AS bucket FROM range(20) t(b)) b
        |LEFT JOIN c USING (bucket)
        |ORDER BY bucket""".stripMargin,
    "q_agg_hash" ->
      """SELECT l_returnflag, l_linestatus,
        |  ROUND(SUM(l_quantity), 2) AS sum_qty,
        |  ROUND(SUM(l_extendedprice), 2) AS sum_base_price,
        |  ROUND(SUM(l_extendedprice * (1.0 - l_discount)), 4) AS sum_disc_price,
        |  ROUND(AVG(l_quantity), 6) AS avg_qty,
        |  ROUND(AVG(l_extendedprice), 6) AS avg_price,
        |  COUNT(*) AS count_order
        |FROM lineitem
        |WHERE l_shipdate <= TIMESTAMP '1998-09-02'
        |GROUP BY l_returnflag, l_linestatus
        |ORDER BY l_returnflag, l_linestatus""".stripMargin,
    "q_agg_hash_decimal" ->
      """SELECT l_returnflag, l_linestatus,
        |  CAST(CAST(SUM(CAST(l_quantity AS DECIMAL(12,2)))
        |    AS DECIMAL(18,2)) AS DOUBLE) AS sum_qty,
        |  CAST(CAST(SUM(CAST(l_extendedprice AS DECIMAL(12,2)))
        |    AS DECIMAL(18,2)) AS DOUBLE) AS sum_base_price,
        |  CAST(CAST(SUM(CAST(l_extendedprice AS DECIMAL(12,2)) *
        |           (CAST('1.00' AS DECIMAL(12,2)) -
        |            CAST(l_discount AS DECIMAL(12,2)))) AS DECIMAL(18,4))
        |    AS DOUBLE) AS sum_disc_price,
        |  CAST(CAST(MIN(CAST(l_extendedprice AS DECIMAL(12,2)))
        |    AS DECIMAL(18,2)) AS DOUBLE) AS min_price,
        |  CAST(CAST(MAX(CAST(l_extendedprice AS DECIMAL(12,2)))
        |    AS DECIMAL(18,2)) AS DOUBLE) AS max_price,
        |  COUNT(*) AS count_order
        |FROM lineitem
        |WHERE l_shipdate <= TIMESTAMP '1998-09-02'
        |GROUP BY l_returnflag, l_linestatus
        |ORDER BY l_returnflag, l_linestatus""".stripMargin,
    "q_agg_global" ->
      """SELECT COUNT(*) AS n_rows,
        |  ROUND(SUM(l_extendedprice), 2) AS sum_price,
        |  MIN(l_extendedprice) AS min_price,
        |  MAX(l_extendedprice) AS max_price,
        |  MIN(l_shipdate) AS min_shipdate,
        |  MAX(l_shipdate) AS max_shipdate
        |FROM lineitem""".stripMargin,
    "q_agg_distinct" ->
      """SELECT l_returnflag,
        |  COUNT(DISTINCT l_partkey) AS cnt_parts,
        |  ROUND(SUM(DISTINCT l_quantity), 2) AS sum_dist_qty
        |FROM lineitem
        |GROUP BY l_returnflag
        |ORDER BY l_returnflag""".stripMargin,
    "q_agg_rollup" ->
      """SELECT COALESCE(o_orderstatus, '_ALL_') AS status,
        |  COALESCE(o_orderpriority, '_ALL_') AS priority,
        |  COUNT(*) AS cnt, ROUND(SUM(o_totalprice), 2) AS sum_price
        |FROM orders
        |GROUP BY ROLLUP(o_orderstatus, o_orderpriority)
        |ORDER BY status, priority""".stripMargin,
    "q_agg_cube" ->
      """SELECT COALESCE(o_orderstatus, '_ALL_') AS status,
        |  COALESCE(o_orderpriority, '_ALL_') AS priority,
        |  COUNT(*) AS cnt, ROUND(SUM(o_totalprice), 2) AS sum_price
        |FROM orders
        |GROUP BY CUBE(o_orderstatus, o_orderpriority)
        |ORDER BY status, priority""".stripMargin,
    "q_agg_grouping_sets" ->
      """SELECT COALESCE(o_orderstatus, '_ALL_') AS status,
        |  COALESCE(o_orderpriority, '_ALL_') AS priority,
        |  COUNT(*) AS cnt, ROUND(SUM(o_totalprice), 2) AS sum_price
        |FROM orders
        |GROUP BY GROUPING SETS ((o_orderstatus), (o_orderpriority), ())
        |ORDER BY status, priority""".stripMargin,
    "q_agg_percentile" ->
      """SELECT l_returnflag,
        |  ROUND(quantile_cont(l_extendedprice, 0.25), 4) AS p25,
        |  ROUND(quantile_cont(l_extendedprice, 0.5), 4) AS p50,
        |  ROUND(quantile_cont(l_extendedprice, 0.75), 4) AS p75,
        |  ROUND(median(l_quantity), 4) AS med_qty
        |FROM lineitem
        |GROUP BY l_returnflag
        |ORDER BY l_returnflag""".stripMargin,
    "q_agg_stats" ->
      """SELECT l_returnflag,
        |  ROUND(stddev_samp(l_quantity), 4) AS sd_qty,
        |  ROUND(var_samp(l_quantity), 4) AS var_qty,
        |  ROUND(corr(l_quantity, l_discount), 4) AS corr_qd,
        |  ROUND(covar_samp(l_quantity, l_discount), 4) AS cov_qd
        |FROM lineitem
        |GROUP BY l_returnflag
        |ORDER BY l_returnflag""".stripMargin,
    "q_agg_collect" ->
      """SELECT n_name,
        |  string_agg(s_name, '|' ORDER BY s_name) AS suppliers,
        |  array_to_string(list_sort(list(DISTINCT s_nationkey)), ',')
        |    AS nationkeys
        |FROM supplier JOIN nation ON s_nationkey = n_nationkey
        |GROUP BY n_name
        |ORDER BY n_name""".stripMargin,
    "q_pivot" ->
      """SELECT o_orderpriority,
        |  COUNT(CASE WHEN o_orderstatus = 'F' THEN 1 END) AS F,
        |  COUNT(CASE WHEN o_orderstatus = 'O' THEN 1 END) AS O,
        |  COUNT(CASE WHEN o_orderstatus = 'P' THEN 1 END) AS P
        |FROM orders
        |GROUP BY o_orderpriority
        |ORDER BY o_orderpriority""".stripMargin)
}
