package graft.relational

import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}
import org.apache.spark.sql.functions._
import graft.{Q, Tables, sessionKey}

/** Scale-technique operators (round 3): the shuffle-shaping idioms a
  * 100 TB deployment leans on — skew salting, bucketed co-located joins,
  * and partitioned layouts with partition pruning — each exposed as an
  * oracle-checked query key so the technique is verified to preserve
  * semantics, not just asserted in prose.
  *
  * Salting notes: a salt must be (a) deterministic, so results are
  * reproducible, and (b) semantics-invariant, so the salted plan equals
  * the unsalted one. Both keys below derive the salt from row-identity
  * columns via xxhash64 → pmod — uniform spread, no RNG, and the salt
  * never leaks into the output.
  */
object ScaleOps {

  private val S = 16 // salt fan-out

  // run-nonce-keyed (graft.Scratch): concurrent invocations on one
  // machine can never clobber each other's layouts mid-read. Layout reuse
  // via `tag` fingerprints still holds within a JVM run.
  private def scratch(sub: String): String = graft.Scratch.dir("scale", sub)

  private def tag(dir: String, tables: String*): String =
    dir.replaceAll("[^a-zA-Z0-9]", "_") + "_" +
      graft.Scratch.fingerprint(dir, tables: _*)

  /** q_agg_salted — two-phase salted aggregation: partial aggregate on
    * (key, salt), final aggregate on key. On a skewed key (3 values cover
    * all of lineitem) the single-phase shuffle would send each key's whole
    * volume to one reducer; the salt phase spreads it S ways and the final
    * phase combines S tiny rows per key. Equal to the direct GROUP BY —
    * which is what the oracle checks. */
  def qAggSalted(s: SparkSession, dir: String): DataFrame = {
    val salted = Tables.lineitem(s, dir)
      .withColumn("salt",
        pmod(xxhash64(col("l_orderkey"), col("l_linenumber"),
          col("l_partkey")), lit(S)))
    val partial = salted.groupBy("l_returnflag", "salt")
      .agg(sum("l_quantity").as("qty"),
        sum("l_extendedprice").as("price"),
        count(lit(1)).as("n"))
    partial.groupBy("l_returnflag")
      .agg(round(sum("qty"), 2).as("sum_qty"),
        round(sum("price"), 2).as("sum_price"),
        sum("n").as("n_rows"))
      .orderBy("l_returnflag")
  }

  /** q_join_skew_salted — salted shuffle join: the probe side gets a
    * deterministic salt in [0, S), the build side is replicated S ways
    * (explode over the salt range), and the join key becomes
    * (key, salt) — a skewed probe key's rows now land on S reducers
    * instead of one. shuffle_hash hint keeps it a shuffle join so the
    * salting (not a broadcast) is what's exercised; result is identical
    * to the plain equi-join, which the oracle checks. */
  def qJoinSkewSalted(s: SparkSession, dir: String): DataFrame = {
    val li = Tables.lineitem(s, dir)
      .withColumn("salt",
        pmod(xxhash64(col("l_orderkey"), col("l_linenumber"),
          col("l_quantity")), lit(S)).cast("int"))
    val part = Tables.part(s, dir)
      .select(col("p_partkey"), col("p_brand"),
        explode(sequence(lit(0), lit(S - 1))).as("salt"))
    li.join(part.hint("shuffle_hash"),
        li("l_partkey") === part("p_partkey") && li("salt") === part("salt"))
      .groupBy("p_brand")
      .agg(count(lit(1)).as("n_items"),
        round(sum("l_quantity"), 2).as("sum_qty"))
      .orderBy("p_brand")
  }

  /** q_join_bucketed — co-located join over bucketed layouts: both sides
    * are written bucketed (and sorted) by the join key, so the join needs
    * NO shuffle and NO sort — each task zips bucket i with bucket i. This
    * is the storage-layout answer to the repeated-join workload: pay the
    * shuffle once at write time, never at read time. PlanSpec asserts the
    * exchange-free plan; the oracle checks the result equals the plain
    * join. */
  def qJoinBucketed(s: SparkSession, dir: String): DataFrame = {
    val t = tag(dir, "orders", "customer")
    val ordersTbl = s"graft_orders_b_$t"
    val custTbl = s"graft_customer_b_$t"
    if (!s.catalog.tableExists(ordersTbl)) {
      Tables.orders(s, dir)
        .write.mode(SaveMode.Overwrite)
        .bucketBy(8, "o_custkey").sortBy("o_custkey")
        .option("path", scratch(s"orders_b_$t"))
        .saveAsTable(ordersTbl)
      Tables.customer(s, dir)
        .write.mode(SaveMode.Overwrite)
        .bucketBy(8, "c_custkey").sortBy("c_custkey")
        .option("path", scratch(s"customer_b_$t"))
        .saveAsTable(custTbl)
    }
    val o = s.table(ordersTbl)
    val c = s.table(custTbl)
    // merge hint: at harness scale Catalyst would broadcast the customer
    // side; the point here is the exchange-free sort-merge over co-located
    // sorted buckets — the plan that wins when BOTH sides are fact-sized
    o.join(c.hint("merge"), o("o_custkey") === c("c_custkey"))
      .groupBy("c_mktsegment")
      .agg(count(lit(1)).as("n_orders"),
        round(sum("o_totalprice"), 2).as("sum_price"))
      .orderBy("c_mktsegment")
  }

  /** q_scan_partitioned — partitioned layout + partition pruning: orders
    * written partitioned by order-year; a year predicate then prunes
    * whole directories before any IO (PartitionFilters in the scan, no
    * row-level work for excluded years). The 100 TB default layout for
    * time-series facts. Oracle recomputes from the flat table. */
  def qScanPartitioned(s: SparkSession, dir: String): DataFrame = {
    val path = scratch(s"orders_part_${tag(dir, "orders")}")
    if (!new java.io.File(path, "_SUCCESS").exists()) {
      Tables.orders(s, dir)
        .withColumn("o_year", year(col("o_orderdate")))
        .write.mode(SaveMode.Overwrite).partitionBy("o_year").parquet(path)
    }
    s.read.parquet(path)
      .filter(col("o_year").isin(1995, 1996))
      .groupBy(col("o_year"), month(col("o_orderdate")).as("o_month"))
      .agg(count(lit(1)).as("n_orders"),
        round(sum("o_totalprice"), 2).as("sum_price"))
      .orderBy("o_year", "o_month")
  }

  /** q_scan_timeslice — date-partitioned events layout + pruned time
    * slice (round 14): closes the events loader's carried NTZ debt
    * (Tables.scala) the way its own doc comment prescribes. The loader's
    * NTZ→LTZ cast sits above the scan, so a literal ts predicate on the
    * FLAT table can never reach the parquet reader as a pushed filter;
    * the at-scale answer is to not filter raw ts at all — partition the
    * events table by event date once at ingest, and time slicing becomes
    * PARTITION PRUNING (directories never listed into the scan) with the
    * residual intra-day predicate evaluated only inside surviving
    * partitions. Layout is fingerprint-keyed + `_SUCCESS`-guarded like
    * the other §2.14 layouts; the query slices 5 of 30 days and keeps an
    * hour-of-day residual to show the two-level shape. PlanSpec asserts
    * the date bounds land in the scan's PartitionFilters and that the
    * scan reads exactly the sliced partitions. At 100 TB this is the
    * difference between listing+reading 30 days and 5 — the standard
    * event-log layout every telemetry pipeline writes. */
  def qScanTimeslice(s: SparkSession, dir: String): DataFrame = {
    val path = scratch(s"events_part_${tag(dir, "events")}")
    if (!new java.io.File(path, "_SUCCESS").exists()) {
      Tables.events(s, dir)
        .withColumn("event_date", to_date(col("ts")))
        .write.mode(SaveMode.Overwrite)
        .partitionBy("event_date").parquet(path)
    }
    s.read.parquet(path)
      .filter(col("event_date")
        .between(lit("2024-01-10"), lit("2024-01-14")))
      .filter(hour(col("ts")) < 12)
      .groupBy("event_date")
      .agg(count(lit(1)).as("n_events"),
        countDistinct("user_id").as("n_users"),
        round(sum("value"), 2).as("sum_value"))
      .orderBy("event_date")
  }

  /** q_join_range_binned — range join via grid-cell binning (round 7):
    * events are matched to varying-width value bands (lo = b², hi =
    * (b+1)², b < 23 — quadratic so widths genuinely vary) NOT with the
    * theta-join Spark would plan for `value >= lo AND value < hi` (a
    * nested-loop that re-scans every band per row), but by overlaying a
    * fixed grid: each band explodes to the G-wide cells it overlaps, each
    * event maps to exactly ONE cell, and the match becomes an EQUI-join
    * on cell + a residual exact range filter. The equi-join hash-shuffles
    * (or broadcasts, as here — 23 bands ≈ 90 cells) instead of
    * nested-looping, which is the rewrite that survives when BOTH sides
    * are large at 100 TB. One output row per match by construction: an
    * event's single cell meets each band at most once — no dedup pass.
    * Oracle recomputes the plain range join. */
  def qJoinRangeBinned(s: SparkSession, dir: String): DataFrame = {
    val G = 16 // grid cell width; ~band width scale so ≤4 cells per band
    val bands = s.range(23).select(
      col("id").cast("int").as("band_id"),
      (col("id") * col("id")).cast("double").as("lo"),
      ((col("id") + 1) * (col("id") + 1)).cast("double").as("hi"))
    // cells overlapping [lo, hi): floor(lo/G) .. (hi-1) div G (hi integral)
    val bandCells = bands.withColumn("cell",
      explode(sequence(
        floor(col("lo") / G).cast("int"),
        ((col("hi").cast("long") - 1) / G).cast("int"))))
    Tables.events(s, dir).select(col("event_id"), col("value"))
      .withColumn("cell", floor(col("value") / G).cast("int"))
      .join(broadcast(bandCells), Seq("cell"))
      .filter(col("value") >= col("lo") && col("value") < col("hi"))
      .groupBy("band_id")
      .agg(count(lit(1)).as("n_events"),
        round(sum("value"), 2).as("sum_value"))
      .orderBy("band_id")
  }

  /** q_filter_bloom — bloom-filter runtime pre-filter for a semi-join
    * (round 7): build a compact bloom filter over the build-side keys
    * (one distributed aggregate; ~120 KB at fpp 0.01 for 1e5 keys), ship
    * it to every probe-side scan task, and drop non-matching rows BEFORE
    * they shuffle — the explicit form of Catalyst's InjectRuntimeFilter,
    * exposed as an operator so the pipeline can apply it across stages
    * (e.g. filter today's 100 TB scan by yesterday's key manifest). The
    * residual exact semi-join removes the bloom's false positives, so the
    * result is EXACTLY the plain semi-join the oracle recomputes; the
    * bloom only shrinks the data that reaches it. */
  def qFilterBloom(s: SparkSession, dir: String): DataFrame = {
    val keys = Tables.customer(s, dir)
      .filter(col("c_mktsegment") === "BUILDING")
      .select("c_custkey")
      .localCheckpoint(true)
    // sized from the actual build-side cardinality (cheap count on the
    // checkpointed keys): a fixed capacity under-sizes at larger SFs and
    // the bloom stops pruning (round-9 advice on the dedup twin).
    // Round 21 (VERDICT r20 item 8): the probe is Spark's native
    // bloom_filter_agg / might_contain pair — the same representation
    // Catalyst's InjectRuntimeFilter ships — so the per-row probe runs
    // inside whole-stage codegen instead of a ScalaUDF boundary. The
    // bloom's false positives differ from the sketch-library filter's,
    // but the residual exact semi-join removes every FP either way: the
    // result set is unchanged by construction. numBits sized for the
    // same ~1% fpp (n·9.6 bits).
    graft.functions.NativeFunctions.register(s)
    val n = math.max(keys.count(), 1L)
    val bfBytes = keys
      .select(expr(s"bloom_filter_agg(xxhash64(c_custkey), ${n}L, " +
        s"${math.max(64L, math.ceil(n * 9.6).toLong)}L)"))
      .head().getAs[Array[Byte]](0)
    val o = Tables.orders(s, dir)
      .filter(call_function("might_contain",
        lit(bfBytes), xxhash64(col("o_custkey"))))
    o.join(broadcast(keys), o("o_custkey") === keys("c_custkey"), "left_semi")
      .groupBy("o_orderstatus")
      .agg(count(lit(1)).as("n_orders"),
        round(sum("o_totalprice"), 2).as("sum_price"))
      .orderBy("o_orderstatus")
  }

  /** One-time-per-session CBO table setup for [[qJoinCbo]]: catalog
    * tables + ANALYZE'd stats persist in the (shared) catalog, so bench
    * re-invocations skip the write. Keyed by session + data fingerprint
    * like the other scratch layouts. */
  private val cboReady =
    new java.util.concurrent.ConcurrentHashMap[String, String]()

  /** Per-root-session CBO-enabled child session: `newSession()` shares
    * the SparkContext, catalog, and cached data but isolates SQL confs —
    * CBO + join reorder stay on for THIS key's plans without perturbing
    * the other 140+ keys sharing the root session. */
  private val cboSession =
    new java.util.concurrent.ConcurrentHashMap[String, SparkSession]()

  /** q_join_cbo — stats-fed join reorder, end-to-end: a 3-table join
    * written fact-fact-first (lineitem ⋈ orders first, the selective
    * customer filter syntactically LAST). With ANALYZE'd row counts and
    * `spark.sql.cbo.joinReorder` on, Catalyst reorders to join the
    * ~50-row filtered dimension first — the compile-time complement of
    * AQE that a 100 TB deployment enables for multi-join queries (a
    * wrong join order there is a 1000× intermediate blow-up, not a
    * bench blip). PlanSpec asserts the dimension leaf actually moves
    * ahead of the fact pair; this oracle-checked key proves the
    * reordered plan still computes the right answer. */
  def qJoinCbo(s: SparkSession, dir: String): DataFrame = {
    val t = tag(dir, "lineitem", "orders", "customer")
    val (li, ord, cust) = (s"cbo_li_$t", s"cbo_ord_$t", s"cbo_cust_$t")
    // entries die with the SparkContext (round-9 advice: static maps
    // keyed by sessionKey otherwise accumulate across session lifecycles)
    graft.SessionCaches.evictOnStop(s, cboSession)
    graft.SessionCaches.evictOnStop(s, cboReady)
    val cbo = cboSession.computeIfAbsent(sessionKey(s), _ => {
      val s2 = s.newSession()
      s2.conf.set("spark.sql.cbo.enabled", "true")
      s2.conf.set("spark.sql.cbo.joinReorder.enabled", "true")
      s2
    })
    cboReady.computeIfAbsent(sessionKey(s) + "/" + t, _ => {
      Tables.lineitem(s, dir).select("l_orderkey", "l_quantity")
        .write.mode(SaveMode.Overwrite)
        .option("path", scratch(s"cbo_li_$t")).saveAsTable(li)
      Tables.orders(s, dir).select("o_orderkey", "o_custkey")
        .write.mode(SaveMode.Overwrite)
        .option("path", scratch(s"cbo_ord_$t")).saveAsTable(ord)
      Tables.customer(s, dir).select("c_custkey", "c_mktsegment")
        .write.mode(SaveMode.Overwrite)
        .option("path", scratch(s"cbo_cust_$t")).saveAsTable(cust)
      Seq(li, ord, cust).foreach { tbl =>
        s.sql(s"ANALYZE TABLE $tbl COMPUTE STATISTICS FOR ALL COLUMNS")
      }
      t
    })
    cbo.sql(
      s"""SELECT c_mktsegment, COUNT(*) AS n_rows,
         |  ROUND(SUM(l_quantity), 2) AS sum_qty
         |FROM $li
         |JOIN $ord ON l_orderkey = o_orderkey
         |JOIN $cust ON o_custkey = c_custkey
         |WHERE c_custkey < 50
         |GROUP BY c_mktsegment
         |ORDER BY c_mktsegment""".stripMargin)
  }

  /** q_join_dpp — dynamic partition pruning, end-to-end: the partitioned
    * orders layout (same scratch layout as [[qScanPartitioned]]) joined
    * on its PARTITION column to a dimension whose selectivity is only
    * known at runtime — the top-2 years by URGENT-order count. A static
    * predicate can prune at plan time; a dimension like this cannot
    * (the surviving years depend on the data, and constraint propagation
    * cannot see through the aggregate+limit), so Catalyst injects a
    * DynamicPruningExpression into the fact scan: the dim's broadcast
    * result is REUSED as a partition filter, and non-matching year
    * directories are skipped before any IO. (The priority filter is
    * load-bearing beyond semantics: PartitionPruning only fires when the
    * dim side carries a likely-selective Filter — a bare aggregate+limit
    * is not enough — and an equality-with-literal on a non-key column
    * qualifies without being inferable onto the fact side.) At 100 TB this is the
    * difference between scanning 2 years and scanning 30 for every
    * dim-filtered query — the partitioned-layout complement of the
    * runtime bloom filter below. PlanSpec asserts the pruning expression
    * lands in the scan's partition filters; this key proves the pruned
    * plan still computes the plain-join answer (oracle recomputes from
    * the flat table). */
  def qJoinDpp(s: SparkSession, dir: String): DataFrame = {
    val path = scratch(s"orders_part_${tag(dir, "orders")}")
    if (!new java.io.File(path, "_SUCCESS").exists()) {
      Tables.orders(s, dir)
        .withColumn("o_year", year(col("o_orderdate")))
        .write.mode(SaveMode.Overwrite).partitionBy("o_year").parquet(path)
    }
    val fact = s.read.parquet(path)
    val topYears = Tables.orders(s, dir)
      .filter(col("o_orderpriority") === "1-URGENT")
      .groupBy(year(col("o_orderdate")).as("y"))
      .agg(count(lit(1)).as("n"))
      .orderBy(desc("n"), col("y"))
      .limit(2)
      .select("y")
    fact.join(broadcast(topYears), fact("o_year") === topYears("y"))
      .groupBy("o_year")
      .agg(count(lit(1)).as("n_orders"),
        round(sum("o_totalprice"), 2).as("sum_price"))
      .orderBy("o_year")
  }

  /** Per-root-session child session for [[qJoinBloomRuntime]] — runtime
    * bloom thresholds opened up for THIS key's plans only (the root
    * session's other keys keep stock thresholds; at harness scale a
    * global threshold=0 would sprinkle bloom subqueries into unrelated
    * joins and perturb every pinned plan shape). */
  private val bloomSession =
    new java.util.concurrent.ConcurrentHashMap[String, SparkSession]()

  /** q_join_bloom_runtime — Catalyst's InjectRuntimeFilter, end-to-end:
    * the OPTIMIZER-injected twin of [[qFilterBloom]]'s hand-built bloom.
    * lineitem joins a selectively-filtered orders side on l_orderkey; at
    * stock thresholds the injection only fires when the application side
    * scans ≥ 10 GB, so the child session lowers the size gates (and
    * disables auto-broadcast — the rewrite targets shuffle joins, which
    * is exactly the 100 TB shape: both sides too big to broadcast).
    * Catalyst then builds a bloom over the filtered orders keys and
    * pushes a `might_contain` predicate into lineitem's SCAN, dropping
    * non-matching rows before the exchange — the optimizer doing
    * automatically what q_filter_bloom composes by hand across stages.
    * PlanSpec asserts the BloomFilterMightContain lands under the fact
    * scan; the oracle recomputes the plain join (the bloom is
    * semantics-free pruning). */
  def qJoinBloomRuntime(s: SparkSession, dir: String): DataFrame = {
    graft.SessionCaches.evictOnStop(s, bloomSession)
    val s2 = bloomSession.computeIfAbsent(sessionKey(s), _ => {
      val child = s.newSession()
      child.conf.set("spark.sql.optimizer.runtime.bloomFilter.enabled",
        "true")
      // creation side must be under this bound to be worth a bloom build
      child.conf.set(
        "spark.sql.optimizer.runtime.bloomFilter.creationSideThreshold",
        "512MB")
      // application side must scan at least this much to benefit — the
      // stock 10GB gate is sized for real clusters, not the harness
      child.conf.set(
        "spark.sql.optimizer.runtime.bloomFilter.applicationSideScanSizeThreshold",
        "0")
      child.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
      child
    })
    val li = Tables.lineitem(s2, dir)
      .select("l_orderkey", "l_returnflag", "l_quantity")
    val ord = Tables.orders(s2, dir)
      .filter(col("o_orderpriority") === "1-URGENT")
      .select("o_orderkey")
    li.join(ord, li("l_orderkey") === ord("o_orderkey"))
      .groupBy("l_returnflag")
      .agg(count(lit(1)).as("n_items"),
        round(sum("l_quantity"), 2).as("sum_qty"))
      .orderBy("l_returnflag")
  }

  /** Per-root-session child session for [[qJoinSkewAqe]] — AQE skew-join
    * thresholds sized for harness-scale shuffles in THIS key's plans
    * only (the stock 256 MB skew threshold is sized for real clusters;
    * lowering it globally would re-plan unrelated keys' pinned shapes). */
  private val skewSession =
    new java.util.concurrent.ConcurrentHashMap[String, SparkSession]()

  /** q_join_skew_aqe — AQE skew-join, end-to-end (round 13): the
    * OPTIMIZER-handled twin of [[qJoinSkewSalted]]'s manual salting,
    * completing §2.14's manual↔optimizer pairing the way q_join_dpp and
    * q_join_bloom_runtime did for pruning and runtime filters. The probe
    * side is given a deliberately skewed derived key (90% of lineitem
    * collapses onto key 0, the rest spreads over 90..99 — the hot-key
    * shape of any real-world power-law join) and shuffle-joined to a
    * 100-row derived dimension with broadcast disabled: without
    * intervention one reducer would process 90% of the fact side while
    * 31 idle — the straggler that turns a 1000-executor join into a
    * 1-executor wait at 100 TB. With `skewJoin.enabled` and thresholds
    * sized to the harness shuffle, AQE's OptimizeSkewedJoin detects the
    * oversized partition at RUNTIME (from the materialized shuffle's
    * actual sizes — no stats, no manual salt) and splits it into
    * advisory-sized sub-reads, each joined against a duplicate of the
    * matching build partition. Salting achieves the same spread by
    * rewriting the QUERY (key+salt, build ×S replication — pays S×
    * build shuffle always); AQE rewrites the RUNTIME only where skew was
    * actually observed. `forceOptimizeSkewedJoin` is on because the
    * downstream per-key aggregate would otherwise veto the split (the
    * split breaks the join's hash partitioning, costing an extra
    * exchange — the standard trade at scale: one extra small shuffle vs
    * a straggler). PlanSpec asserts the skew-split marker in the
    * adaptive FINAL plan; the oracle recomputes the plain join (the
    * split is semantics-free). */
  def qJoinSkewAqe(s: SparkSession, dir: String): DataFrame = {
    graft.SessionCaches.evictOnStop(s, skewSession)
    val s2 = skewSession.computeIfAbsent(sessionKey(s), _ => {
      val c = s.newSession()
      c.conf.set("spark.sql.adaptive.enabled", "true")
      c.conf.set("spark.sql.adaptive.skewJoin.enabled", "true")
      // detect: partition > max(threshold, factor × median) — the stock
      // 256 MB gate is sized for executor-memory pressure on a real
      // cluster, not a sf0.001–0.1 harness shuffle
      c.conf.set(
        "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes",
        "1KB")
      c.conf.set("spark.sql.adaptive.skewJoin.skewedPartitionFactor", "2.0")
      // split target: each skewed partition becomes ~advisory-sized reads
      c.conf.set("spark.sql.adaptive.advisoryPartitionSizeInBytes", "1KB")
      c.conf.set("spark.sql.adaptive.forceOptimizeSkewedJoin", "true")
      // the rewrite targets shuffle joins (the 100 TB shape: both sides
      // too big to broadcast; a broadcast join cannot skew)
      c.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
      c
    })
    // the 16-way round-robin repartition stands in for the many upstream
    // map tasks any 100 TB scan has: AQE's skew split works at
    // MAP-OUTPUT granularity (a skewed reduce partition is split into
    // ranges of its contributing map blocks), so a single-mapper shuffle
    // — which is what a one-file harness scan produces — is physically
    // unsplittable no matter the thresholds. Semantics-free.
    val li = Tables.lineitem(s2, dir)
      .repartition(16)
      .withColumn("sk",
        when(pmod(col("l_orderkey"), lit(100)) < 90, lit(0L))
          .otherwise(pmod(col("l_orderkey"), lit(100))))
    val dim = s2.range(100).select(col("id").as("k"),
      (col("id") * 3 + 1).as("payload"))
    li.join(dim, col("sk") === col("k"))
      .groupBy("sk", "payload")
      .agg(count(lit(1)).as("n_items"),
        round(sum("l_quantity"), 2).as("sum_qty"))
      .orderBy("sk")
  }

  val queries: Map[String, Q] = Map(
    "q_agg_salted" -> (qAggSalted _),
    "q_join_skew_aqe" -> (qJoinSkewAqe _),
    "q_join_skew_salted" -> (qJoinSkewSalted _),
    "q_join_bucketed" -> (qJoinBucketed _),
    "q_scan_partitioned" -> (qScanPartitioned _),
    "q_scan_timeslice" -> (qScanTimeslice _),
    "q_join_range_binned" -> (qJoinRangeBinned _),
    "q_filter_bloom" -> (qFilterBloom _),
    "q_join_cbo" -> (qJoinCbo _),
    "q_join_dpp" -> (qJoinDpp _),
    "q_join_bloom_runtime" -> (qJoinBloomRuntime _))

  val oracle: Map[String, String] = Map(
    "q_scan_timeslice" ->
      """SELECT CAST(ts AS DATE) AS event_date,
        |       COUNT(*) AS n_events,
        |       COUNT(DISTINCT user_id) AS n_users,
        |       ROUND(SUM(value), 2) AS sum_value
        |FROM events
        |WHERE CAST(ts AS DATE)
        |        BETWEEN DATE '2024-01-10' AND DATE '2024-01-14'
        |  AND EXTRACT(hour FROM ts) < 12
        |GROUP BY 1
        |ORDER BY 1""".stripMargin,
    "q_join_skew_aqe" ->
      """WITH li AS (
        |  SELECT CASE WHEN l_orderkey % 100 < 90 THEN 0
        |              ELSE l_orderkey % 100 END AS sk,
        |    l_quantity
        |  FROM lineitem),
        |dim AS (SELECT k, k * 3 + 1 AS payload FROM range(100) t(k))
        |SELECT sk, payload, COUNT(*) AS n_items,
        |  ROUND(SUM(l_quantity), 2) AS sum_qty
        |FROM li JOIN dim ON sk = k
        |GROUP BY sk, payload
        |ORDER BY sk""".stripMargin,
    "q_agg_salted" ->
      """SELECT l_returnflag,
        |  ROUND(SUM(l_quantity), 2) AS sum_qty,
        |  ROUND(SUM(l_extendedprice), 2) AS sum_price,
        |  COUNT(*) AS n_rows
        |FROM lineitem
        |GROUP BY l_returnflag
        |ORDER BY l_returnflag""".stripMargin,
    "q_join_skew_salted" ->
      """SELECT p_brand, COUNT(*) AS n_items,
        |  ROUND(SUM(l_quantity), 2) AS sum_qty
        |FROM lineitem JOIN part ON l_partkey = p_partkey
        |GROUP BY p_brand
        |ORDER BY p_brand""".stripMargin,
    "q_join_bucketed" ->
      """SELECT c_mktsegment, COUNT(*) AS n_orders,
        |  ROUND(SUM(o_totalprice), 2) AS sum_price
        |FROM orders JOIN customer ON o_custkey = c_custkey
        |GROUP BY c_mktsegment
        |ORDER BY c_mktsegment""".stripMargin,
    "q_scan_partitioned" ->
      """SELECT CAST(year(o_orderdate) AS INT) AS o_year,
        |  CAST(month(o_orderdate) AS INT) AS o_month,
        |  COUNT(*) AS n_orders,
        |  ROUND(SUM(o_totalprice), 2) AS sum_price
        |FROM orders
        |WHERE year(o_orderdate) IN (1995, 1996)
        |GROUP BY 1, 2
        |ORDER BY o_year, o_month""".stripMargin,
    "q_join_range_binned" ->
      """WITH bands AS (
        |  SELECT b::INT AS band_id, (b * b)::DOUBLE AS lo,
        |    ((b + 1) * (b + 1))::DOUBLE AS hi
        |  FROM range(23) t(b))
        |SELECT band_id, COUNT(*) AS n_events,
        |  ROUND(SUM(value), 2) AS sum_value
        |FROM events JOIN bands ON value >= lo AND value < hi
        |GROUP BY band_id
        |ORDER BY band_id""".stripMargin,
    "q_filter_bloom" ->
      """SELECT o_orderstatus, COUNT(*) AS n_orders,
        |  ROUND(SUM(o_totalprice), 2) AS sum_price
        |FROM orders
        |WHERE o_custkey IN (
        |  SELECT c_custkey FROM customer WHERE c_mktsegment = 'BUILDING')
        |GROUP BY o_orderstatus
        |ORDER BY o_orderstatus""".stripMargin,
    "q_join_dpp" ->
      """WITH top_years AS (
        |  SELECT CAST(year(o_orderdate) AS INT) AS y
        |  FROM orders WHERE o_orderpriority = '1-URGENT' GROUP BY 1
        |  ORDER BY COUNT(*) DESC, y LIMIT 2)
        |SELECT CAST(year(o_orderdate) AS INT) AS o_year,
        |  COUNT(*) AS n_orders,
        |  ROUND(SUM(o_totalprice), 2) AS sum_price
        |FROM orders JOIN top_years ON year(o_orderdate) = y
        |GROUP BY 1
        |ORDER BY o_year""".stripMargin,
    "q_join_bloom_runtime" ->
      """SELECT l_returnflag, COUNT(*) AS n_items,
        |  ROUND(SUM(l_quantity), 2) AS sum_qty
        |FROM lineitem JOIN orders ON l_orderkey = o_orderkey
        |WHERE o_orderpriority = '1-URGENT'
        |GROUP BY l_returnflag
        |ORDER BY l_returnflag""".stripMargin,
    "q_join_cbo" ->
      """SELECT c_mktsegment, COUNT(*) AS n_rows,
        |  ROUND(SUM(l_quantity), 2) AS sum_qty
        |FROM lineitem
        |JOIN orders ON l_orderkey = o_orderkey
        |JOIN customer ON o_custkey = c_custkey
        |WHERE c_custkey < 50
        |GROUP BY c_mktsegment
        |ORDER BY c_mktsegment""".stripMargin)
}
