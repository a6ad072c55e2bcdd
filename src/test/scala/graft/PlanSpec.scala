package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Physical-plan regression tests: the scale-critical plan properties
  * audited manually with graft.Explain, enforced so a refactor can't
  * silently lose a pushdown or broadcast (SCALE.md is the rationale). */
class PlanSpec extends AnyFunSuite with SparkFixture {

  private def planOf(df: org.apache.spark.sql.DataFrame): String =
    df.queryExecution.executedPlan.toString

  test("q_agg_hash pushes the shipdate filter into the parquet scan and " +
      "prunes columns") {
    val plan = planOf(relational.Aggregates.qAggHash(spark, sf0001))
    assert(plan.contains("PushedFilters") &&
      plan.contains("LessThanOrEqual(l_shipdate"))
    // pruned read: the 11-column table is read with 6 columns
    assert(!plan.contains("l_orderkey"), "scan should not read unused keys")
  }

  test("q_profile_table runs Expand-free — per-column distinct subtrees " +
      "cross-joined as 1-row frames, no window, no data-sized join " +
      "(round 21)") {
    val plan = planOf(relational.Stats.qProfileTable(spark, sf0001))
    // the multi-distinct-in-one-aggregate form Expanded the scan ×4
    // (every profiled row shuffled 4 times); the split form must not
    assert(!plan.contains("Expand"),
      s"profiler regressed to the multi-distinct Expand:\n$plan")
    assert(!plan.contains("Window"), "profiler must not window")
    // the only joins are the 1-row aggregate cross-joins — never a
    // hash/merge join of data-sized sides
    assert(!plan.contains("SortMergeJoin") &&
      !plan.contains("BroadcastHashJoin") &&
      !plan.contains("ShuffledHashJoin"),
      s"profiler must not join data-sized sides:\n$plan")
    // the documented 100 TB swap (approx_count_distinct) must remove the
    // Expand entirely: one scan, one partial-merge aggregate
    val approxPlan = planOf(relational.Stats.qProfileTableApprox(
      spark, sf0001))
    assert(!approxPlan.contains("Expand"),
      "approx profiler should be Expand-free (single-scan HLL)")
    assert(!approxPlan.contains("Join") && !approxPlan.contains("Window"))
  }

  test("q_filter_pred pushes the full compound predicate") {
    val plan = planOf(relational.Core.qFilterPred(spark, sf0001))
    assert(plan.contains("IN (A,R)"))
    assert(plan.contains("Contains(l_linestatus") ||
      plan.contains("StringContains(l_linestatus"))
    // the scan carries the predicate too (datasource pushdown)
    assert(plan.contains("PushedFilters: [Or(And("))
  }

  test("dimension join broadcasts the small side") {
    val plan = planOf(relational.Joins.qJoinBroadcast(spark, sf0001))
    assert(plan.contains("BroadcastHashJoin"))
    assert(!plan.contains("SortMergeJoin"))
  }

  test("global top-k plans as TakeOrderedAndProject, not a full sort") {
    val plan = planOf(relational.Core.qLimitTopk(spark, sf0001))
    assert(plan.contains("TakeOrderedAndProject"))
  }

  test("theta join stays hash-based via its equi-conjunct") {
    val plan = planOf(relational.Joins.qJoinTheta(spark, sf0001))
    assert(plan.contains("HashJoin") || plan.contains("SortMergeJoin"),
      s"expected a hash/merge join with residual condition, got:\n$plan")
    assert(!plan.contains("CartesianProduct") &&
      !plan.contains("BroadcastNestedLoopJoin"))
  }

  test("grouped aggregates are partial+final (map-side combine)") {
    val plan = planOf(relational.Aggregates.qAggHash(spark, sf0001))
    assert(plan.contains("partial_sum") || plan.contains("HashAggregate"))
    assert("HashAggregate".r.findAllIn(plan).length >= 2,
      "expected a partial and a final HashAggregate")
  }

  test("bucketed join is exchange-free and sort-free on both sides") {
    val df = relational.ScaleOps.qJoinBucketed(spark, sf0001)
    val plan = planOf(df)
    assert(plan.contains("SortMergeJoin"),
      s"expected a sort-merge join over bucketed tables in:\n$plan")
    // co-located + co-sorted buckets: no shuffle before the join (the
    // only exchange allowed is the post-join aggregation's)
    val joinPart = plan.substring(plan.indexOf("SortMergeJoin"))
    assert(!joinPart.contains("Exchange hashpartitioning"),
      s"bucketed join must not shuffle its inputs:\n$plan")
    assert(plan.contains("SelectedBucketsCount"),
      s"scan should report bucket selection:\n$plan")
  }

  test("partitioned scan prunes partitions from the year predicate") {
    val plan = planOf(relational.ScaleOps.qScanPartitioned(spark, sf0001))
    assert(plan.contains("PartitionFilters") && plan.contains("o_year"),
      s"expected a partition filter on o_year in:\n$plan")
  }

  test("salted join and salted agg equal their unsalted forms") {
    import org.apache.spark.sql.functions._
    val salted = relational.ScaleOps.qJoinSkewSalted(spark, sf0001)
      .collect().map(_.toSeq).toSeq
    val plain = Tables.lineitem(spark, sf0001)
      .join(Tables.part(spark, sf0001),
        col("l_partkey") === col("p_partkey"))
      .groupBy("p_brand")
      .agg(count(lit(1)).as("n_items"),
        round(sum("l_quantity"), 2).as("sum_qty"))
      .orderBy("p_brand").collect().map(_.toSeq).toSeq
    assert(salted == plain)
    val aggSalted = relational.ScaleOps.qAggSalted(spark, sf0001)
      .select("l_returnflag", "n_rows").collect().map(_.toSeq).toSeq
    val aggPlain = Tables.lineitem(spark, sf0001)
      .groupBy("l_returnflag").agg(count(lit(1)).as("n_rows"))
      .orderBy("l_returnflag").collect().map(_.toSeq).toSeq
    assert(aggSalted == aggPlain)
  }

  /** Set confs, run the body, restore prior values even on failure. */
  private def withConfs[T](confs: (String, String)*)(body: => T): T = {
    val prior = confs.map { case (k, _) =>
      k -> util.Try(spark.conf.get(k)).toOption }
    confs.foreach { case (k, v) => spark.conf.set(k, v) }
    try body
    finally prior.foreach {
      case (k, Some(v)) => spark.conf.set(k, v)
      case (k, None) => spark.conf.unset(k)
    }
  }

  test("CBO reorders a 3-table join by size once tables have stats") {
    // SURVEY §7.5's deferred CBO surface: with ANALYZE'd row counts and
    // spark.sql.cbo.joinReorder on, the optimizer joins the selective
    // dimension first instead of following the syntactic order. AQE
    // handles runtime re-planning; this is the complementary compile-time
    // path a 100 TB user enables for multi-join queries.
    val dir = java.nio.file.Files.createTempDirectory("graft_cbo").toString
    Tables.lineitem(spark, sf0001).select("l_orderkey", "l_quantity")
      .write.option("path", s"$dir/li").saveAsTable("cbo_li")
    Tables.orders(spark, sf0001).select("o_orderkey", "o_custkey")
      .write.option("path", s"$dir/ord").saveAsTable("cbo_ord")
    Tables.customer(spark, sf0001).select("c_custkey", "c_mktsegment")
      .write.option("path", s"$dir/cust").saveAsTable("cbo_cust")
    try {
      Seq("cbo_li", "cbo_ord", "cbo_cust").foreach { t =>
        spark.sql(s"ANALYZE TABLE $t COMPUTE STATISTICS FOR ALL COLUMNS")
      }
      // stats actually flow into the plan (rowCount is only propagated
      // into Statistics when CBO is on)
      val rc = withConfs("spark.sql.cbo.enabled" -> "true") {
        spark.table("cbo_li").queryExecution.optimizedPlan.stats.rowCount
      }
      assert(rc.exists(_.toLong > 0L), s"expected ANALYZE row count, got $rc")
      // syntactically join the big fact pair FIRST, tiny filtered dim last
      def query() = spark.sql(
        """SELECT count(*) AS n
          |FROM cbo_li
          |JOIN cbo_ord ON l_orderkey = o_orderkey
          |JOIN cbo_cust ON o_custkey = c_custkey
          |WHERE c_custkey < 5""".stripMargin)
      def leafOrder(df: org.apache.spark.sql.DataFrame): Seq[String] =
        df.queryExecution.optimizedPlan.collectLeaves().map(_.toString)
      def idx(leaves: Seq[String], t: String): Int =
        leaves.indexWhere(_.contains(t))
      val off = withConfs("spark.sql.cbo.enabled" -> "false") {
        leafOrder(query())
      }
      assert(idx(off, "cbo_cust") > idx(off, "cbo_li"),
        s"without CBO the syntactic order should hold: $off")
      val on = withConfs(
        "spark.sql.cbo.enabled" -> "true",
        "spark.sql.cbo.joinReorder.enabled" -> "true") {
        leafOrder(query())
      }
      assert(idx(on, "cbo_cust") < idx(on, "cbo_li"),
        s"CBO should join the 4-row dim before the fact table: $on")
      // and reordering preserved the result
      assert(query().collect().head.getLong(0) ==
        withConfs("spark.sql.cbo.enabled" -> "false") {
          query().collect().head.getLong(0) })
    } finally {
      Seq("cbo_li", "cbo_ord", "cbo_cust").foreach { t =>
        spark.sql(s"DROP TABLE IF EXISTS $t") }
    }
  }

  test("AQE splits a skewed shuffle partition (skewJoin rewrite)") {
    // Complement of the manual-salting keys (q_join_skew_salted): when
    // skew only shows at runtime, AQE's OptimizeSkewedJoin splits the
    // oversized partition into subpartitions and replicates the matching
    // build rows — no query rewrite needed. Manual salting remains the
    // tool when the engine can't see the skew (e.g. a skewed agg key) or
    // AQE is unavailable; this test documents that the AQE path works.
    import spark.implicits._
    withConfs(
      "spark.sql.adaptive.enabled" -> "true",
      "spark.sql.adaptive.skewJoin.enabled" -> "true",
      "spark.sql.adaptive.skewJoin.skewedPartitionFactor" -> "2",
      "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes" -> "30KB",
      "spark.sql.adaptive.advisoryPartitionSizeInBytes" -> "16KB",
      "spark.sql.adaptive.coalescePartitions.enabled" -> "false",
      "spark.sql.autoBroadcastJoinThreshold" -> "-1") {
      // hot key: 99% of the left side lands in one shuffle partition. The
      // payload column rides along (consumed by the post-join sum) so the
      // hot partition's shuffle bytes aren't compressed away below the
      // skew threshold — a partition of nothing but k=0 is ~free in lz4.
      val left = spark.range(100000)
        .select(when(col("id") % 100 =!= 0, lit(0L)).otherwise(col("id"))
          .as("k"), pmod(xxhash64(col("id")), lit(1000000L)).as("v"))
      val right = spark.range(100).select(col("id").as("k"))
      val joined = left.join(right, "k")
        .select(count(lit(1)).as("n"), sum("v").as("sv"))
      val n = joined.collect().head.getLong(0)
      // only the hot key 0 matches the 0..99 build side: the 99 000
      // remainder rows plus id=0 itself
      assert(n == 99001L, s"join produced $n rows")
      val finalPlan = joined.queryExecution.executedPlan.toString
      assert(finalPlan.contains("skew=true"),
        s"expected AQE skew-join split in:\n$finalPlan")
    }
  }

  test("cache hygiene: query fns leave the SQL cache empty once consumed") {
    // Q's cache-ownership contract (graft/package.scala): the four
    // operators that legitimately materialize an intermediate must not
    // leak it into the session's SQL cache — 95 keys share one session
    // under Verify/Bench, and leaked entries pile into a GC benchmark.
    spark.catalog.clearCache()
    val fns: Seq[(String, graft.Q)] = Seq(
      "q_dedup_near" -> (llm.Dedup.qDedupNear _),
      "q_dedup_cluster" -> (llm.DedupVariants.qDedupCluster _),
      "q_ml_eval" -> (ml.Pipelines.qMlEval _),
      "q_ml_cv" -> (ml.Pipelines.qMlCv _))
    fns.foreach { case (name, fn) =>
      fn(spark, sf0001).count()
      assert(
        org.apache.spark.sql.graftprobe.CacheProbe.sqlCacheEmpty(spark),
        s"$name left a plan in the SQL cache")
    }
  }

  test("dynamic partition pruning fires on a partitioned layout") {
    // SURVEY §7.5's deferred demo: write orders partitioned by year, join
    // against a filtered dim — the fact scan must carry a partition filter
    // sourced from the dim side (static or dynamic pruning).
    val dir = java.nio.file.Files
      .createTempDirectory("graft_dpp").toString
    Tables.orders(spark, sf0001)
      .withColumn("o_year", year(col("o_orderdate")))
      .write.mode("overwrite").partitionBy("o_year")
      .parquet(s"$dir/orders_part")
    val fact = spark.read.parquet(s"$dir/orders_part")
    val dim = spark.range(1995, 1997)
      .select(col("id").cast("int").as("o_year"),
        lit("window").as("tag"))
    val joined = fact.join(dim, Seq("o_year"))
      .groupBy("o_year").agg(count(lit(1)).as("n"))
    val plan = planOf(joined)
    assert(plan.contains("dynamicpruning") ||
      plan.contains("PartitionFilters: [isnotnull(o_year"),
      s"expected partition pruning in:\n$plan")
    // and the result is correct: only years 1995–1996 survive
    val years = joined.collect().map(_.getInt(0)).sorted
    assert(years.forall(y => y >= 1995 && y <= 1996))
  }

  test("q_scan_timeslice: the date slice is a PartitionFilter (5 of 30 " +
      "day directories read), the hour residual stays a data filter") {
    import org.apache.spark.sql.execution.{FileSourceScanExec, SparkPlan}
    import org.apache.spark.sql.execution.adaptive.{AdaptiveSparkPlanExec, QueryStageExec}
    val df = relational.ScaleOps.qScanTimeslice(spark, sf0001)
    df.collect() // materialize so the scan's driver metrics are final
    def scans(p: SparkPlan): Seq[FileSourceScanExec] = p match {
      case a: AdaptiveSparkPlanExec => scans(a.executedPlan)
      case q: QueryStageExec => scans(q.plan)
      case s: FileSourceScanExec => Seq(s)
      case other => other.children.flatMap(scans)
    }
    val scan = scans(df.queryExecution.executedPlan)
      .headOption.getOrElse(fail("no FileSourceScanExec in the plan"))
    val str = scan.toString
    // the date bounds must be PARTITION filters — pruned at listing
    // time, before any file IO — not data filters evaluated per row
    assert(str.contains("PartitionFilters") &&
      str.indexOf("event_date", str.indexOf("PartitionFilters")) > 0,
      s"date slice did not land in PartitionFilters:\n$str")
    // the intra-day residual is NOT a partition predicate: it must not
    // appear among the PartitionFilters (it is evaluated per row, but
    // only over rows of the 5 surviving day directories)
    val partFilters = str.drop(str.indexOf("PartitionFilters"))
      .takeWhile(_ != ']')
    assert(!partFilters.contains("hour"),
      s"hour residual leaked into PartitionFilters: $partFilters")
    // pruning proof: the scan read exactly the 5 sliced day partitions
    val partMetric = scan.metrics.get("numPartitions")
    assert(partMetric.isDefined, "partitioned scan exposes numPartitions")
    assert(partMetric.get.value == 5,
      s"expected 5 day partitions read, got ${partMetric.get.value}")
  }

  test("binned range join plans as an equi-join, not a nested loop") {
    // q_join_range_binned's whole point: the grid-cell rewrite turns the
    // interval predicate into a hashable equi-key; a theta-join here
    // would plan as BroadcastNestedLoopJoin and re-scan every band per row
    val plan = planOf(relational.ScaleOps.qJoinRangeBinned(spark, sf0001))
    assert(plan.contains("BroadcastHashJoin") || plan.contains("HashJoin"),
      s"expected a hash equi-join on cell in:\n$plan")
    assert(!plan.contains("BroadcastNestedLoopJoin") &&
      !plan.contains("CartesianProduct"))
  }

  test("z-score anomaly scan broadcasts the per-type moments (no big-side " +
      "shuffle, no window)") {
    val plan = planOf(relational.Stats.qAnomalyZscore(spark, sf0001))
    assert(plan.contains("BroadcastHashJoin"),
      s"expected the O(types) stats broadcast in:\n$plan")
    assert(!plan.contains("SortMergeJoin") && !plan.contains("Window"),
      "the events side must not shuffle for the stats join")
  }

  test("quantile binning probes broadcast cutoffs — no ntile window, no " +
      "global sort of the input") {
    val plan = planOf(relational.Stats.qQuantileBins(spark, sf0001))
    assert(!plan.contains("Window"),
      s"binning must come from cutoffs, not ntile ranks:\n$plan")
    assert(!plan.contains("SortMergeJoin"),
      s"the only join is the 1-row cutoff broadcast:\n$plan")
    // the documented 100 TB swap (approx_percentile sketch cutoffs) must
    // keep the exact same plan shape — the swap is one aggregate
    // function, not a re-architecture
    val approxPlan = planOf(relational.Stats.quantileBinsApprox(
      spark, sf0001))
    assert(!approxPlan.contains("Window") &&
      !approxPlan.contains("SortMergeJoin"),
      "approx binning lost the broadcast-probe plan shape")
  }

  test("bm25 ranks via distributed top-k with broadcast term/corpus stats") {
    val plan = planOf(llm.Retrieval.qRankBm25(spark, sf0001))
    assert(plan.contains("TakeOrderedAndProject"),
      s"top-20 must be a partial top-k, not a global sort:\n$plan")
    assert(!plan.contains("SortMergeJoin"),
      s"df/corpus sides are O(terms)/1-row — must broadcast:\n$plan")
  }

  test("star join pushes all three dimension filters into the scans") {
    val plan = planOf(relational.Joins.qJoinStar(spark, sf0001))
    assert(plan.contains("EqualTo(c_mktsegment,BUILDING)"),
      s"customer segment filter must reach the scan:\n$plan")
    assert(plan.contains("LessThan(o_orderdate") &&
      plan.contains("GreaterThan(l_shipdate"),
      s"date filters must reach the orders/lineitem scans:\n$plan")
    assert(plan.contains("TakeOrderedAndProject"))
  }

  test("bloom pre-filter sits in the probe scan stage, before the join, " +
      "as the native codegen'd might_contain (no ScalaUDF, round 21)") {
    val df = relational.ScaleOps.qFilterBloom(spark, sf0001)
    val plan = planOf(df)
    // the might_contain probe must be a Filter below the semi-join (scan
    // side), not above it — otherwise it prunes nothing
    val joinIdx = plan.indexOf("Join")
    val probeIdx = plan.indexOf("might_contain")
    assert(joinIdx >= 0 && probeIdx >= 0,
      s"missing join or might_contain in:\n$plan")
    assert(probeIdx > joinIdx,
      "bloom filter should appear below (after, in explain order) the join")
    // VERDICT r20 item 8: the probe is Spark's native expression inside
    // codegen, not a ScalaUDF boundary
    assert(!plan.contains("UDF"),
      s"bloom probe must not be a ScalaUDF:\n$plan")
  }

  test("q_join_dpp: the runtime dim result prunes the fact scan's " +
      "PARTITION filters (dynamic partition pruning)") {
    val plan = planOf(relational.ScaleOps.qJoinDpp(spark, sf0001))
    // the top-2-years dim is only knowable at runtime, so Catalyst must
    // inject a DynamicPruningExpression into the partitioned scan —
    // non-matching o_year directories are then skipped before any IO
    val low = plan.toLowerCase
    assert(low.contains("dynamicpruningexpression"),
      s"fact scan must carry a dynamic pruning expression:\n$plan")
    val pf = low.indexOf("partitionfilters")
    assert(pf >= 0 && low.indexOf("dynamicpruningexpression", pf) >= 0,
      s"the pruning expression must sit in PartitionFilters:\n$plan")
  }

  test("q_join_bloom_runtime: Catalyst injects a bloom might_contain " +
      "under the fact side of the shuffle join") {
    val df = relational.ScaleOps.qJoinBloomRuntime(spark, sf0001)
    val opt = df.queryExecution.optimizedPlan.toString
    assert(opt.contains("might_contain") && opt.contains("bloom_filter_agg"),
      s"optimizer must inject the runtime bloom filter:\n$opt")
    // and it must land BELOW the join (fact/application side), where it
    // drops rows before the exchange — not above, where it prunes nothing
    val joinIdx = opt.indexOf("Join")
    val mcIdx = opt.indexOf("might_contain")
    assert(joinIdx >= 0 && mcIdx > joinIdx,
      s"might_contain must sit under the join in explain order:\n$opt")
  }

  test("native similarity kernels run inside whole-stage codegen") {
    // the point of ArrayDotProduct / ArrayAdcDistance over UDFs and
    // higher-order expressions is staying INSIDE the codegen stage: the
    // operator line carrying the kernel must be codegen'd (a `*(n)`
    // stage id), or the per-pair hot loop fell back to interpreted eval
    def kernelLines(df: org.apache.spark.sql.DataFrame, fn: String) = {
      df.collect() // materialize (AQE finalizes stage shapes)
      val lines = df.queryExecution.executedPlan.toString
        .linesIterator.filter(_.contains(s"$fn(")).toSeq
      assert(lines.nonEmpty, s"no $fn call in the executed plan")
      lines
    }
    val topk = llm.Similarity.qSimTopk(spark, sf0001)
    assert(kernelLines(topk, "array_dot")
        .exists(l => l.contains("*(")),
      "array_dot is not inside a WholeStageCodegen stage")
    val pq = llm.Similarity.qSimPq(spark, sf0001)
    assert(kernelLines(pq, "adc_distance")
        .exists(l => l.contains("*(")),
      "adc_distance is not inside a WholeStageCodegen stage")
  }

  test("q_split_holdout: the leakage audit is a fingerprint " +
      "semi-join and the held-out filter reaches the scan") {
    val df = llm.Curation.qSplitHoldout(spark, sf0001)
    val plan = planOf(df)
    // the train fingerprint set (16-byte md5s) is what moves in a
    // LeftSemi probe — never the corpus text. No broadcast hint in the
    // query (the train side is unbounded in corpus size, ADVICE r13):
    // at harness scale the planner broadcasts under the threshold, at
    // 100 TB it is free to pick a shuffled semi-join on the 16-byte
    // fingerprint — both join strategies are the correct shape.
    assert(plan.contains("LeftSemi"),
      s"expected a semi-join leakage probe in:\n$plan")
    val semiLine = plan.linesIterator.find(_.contains("LeftSemi")).get
    assert(semiLine.contains("BroadcastHashJoin") ||
        semiLine.contains("SortMergeJoin") ||
        semiLine.contains("ShuffledHashJoin"),
      s"the fingerprint probe is not a hash/merge semi-join: $semiLine")
    // the split≠train predicate prunes the audit's scan BELOW the join
    // (scan-side assignment: no exchange computes the split column)
    assert(plan.contains("DataFilters: [NOT CASE WHEN") ||
        plan.contains("DataFilters: [isnotnull(text") ||
        plan.contains("Filter NOT CASE WHEN"),
      s"held-out filter did not reach the audit scan:\n$plan")
  }

  test("q_join_skew_aqe: OptimizeSkewedJoin splits the hot partition " +
      "in the adaptive final plan") {
    val df = relational.ScaleOps.qJoinSkewAqe(spark, sf0001)
    df.collect() // materialize: AQE finalizes plan shape at runtime
    val plan = df.queryExecution.executedPlan.toString
    // the skew split shows up twice in a finalized adaptive plan: the
    // shuffle read over the split partition prints AQEShuffleRead with
    // its `skewed` spec, and the sort-merge join is marked skew=true
    assert(plan.contains("AQEShuffleRead") && plan.contains("skewed"),
      s"expected a skew-split AQEShuffleRead in the final plan:\n$plan")
    // and it must still be a shuffle join (broadcast disabled) — a
    // broadcast join here would mean the skew machinery was never in play
    assert(plan.contains("SortMergeJoin") || plan.contains("ShuffledHashJoin"),
      s"expected a shuffle join:\n$plan")
  }

  test("incremental dedup probes the bloom manifest in the scan stage, " +
      "below the residual anti-join") {
    val df = llm.DedupVariants.qDedupIncremental(spark, sf0001)
    val plan = planOf(df)
    // the manifest check must prune today's scan BEFORE any exchange /
    // join — a bloom filter above the anti-join would prune nothing
    val joinIdx = plan.indexOf("LeftAnti")
    assert(joinIdx >= 0, s"expected a residual anti-join in:\n$plan")
    assert(plan.indexOf("might_contain", joinIdx) >= 0,
      s"bloom might_contain must sit below the anti-join (scan side):\n$plan")
    assert(!plan.contains("UDF"),
      s"bloom probe must be the native expression, not a ScalaUDF:\n$plan")
    // and the bloom-negative branch joins nothing at all: exactly one
    // join in the whole plan (the residual), unioned with a plain filter
    assert("LeftAnti".r.findAllIn(plan).length == 1 && plan.contains("Union"))
    // semantics = plain anti-join (bloom has no false negatives; false
    // positives die in the residual join)
    val viaPlain = Tables.documents(spark, sf0001)
      .select(col("doc_id"),
        md5(concat_ws(" ", slice(split(col("text"), " "), 1, 16)))
          .as("prefix_md5"))
    val expected = viaPlain.filter(col("doc_id") % 4 === 3)
      .join(viaPlain.filter(col("doc_id") % 4 =!= 3).select("prefix_md5"),
        Seq("prefix_md5"), "left_anti")
      .select("doc_id").collect().map(_.getLong(0)).sorted
    assert(df.select("doc_id").collect().map(_.getLong(0)).sameElements(
      expected))
  }

  test("manifest write-back probes both days through the bloom, below " +
      "each residual anti-join, with the manifest side broadcast") {
    val df = llm.DedupVariants.qDedupManifestUpdate(spark, sf0001)
    val plan = planOf(df)
    // the day-1 probe ran inside its eager localCheckpoint (the
    // write-back must materialize before the manifest is rewritten), so
    // the returned plan carries exactly the DAY-2 probe: one residual
    // anti-join with the bloom might_contain filter below it scan-side
    val antis = "LeftAnti".r.findAllMatchIn(plan).map(_.start).toSeq
    assert(antis.length == 1,
      s"expected the day-2 residual anti-join:\n$plan")
    antis.foreach { i =>
      assert(plan.indexOf("might_contain", i) >= 0,
        s"bloom might_contain must sit below the anti-join:\n$plan")
    }
    // both bloom branches present: the negative branch (NOT
    // might_contain) is a plain filter that never joins
    assert(plan.contains("NOT might_contain"),
      s"bloom-negative branch must skip the join entirely:\n$plan")
    // the compact manifests broadcast; today's slice never shuffles
    assert(plan.contains("BroadcastHashJoin") ||
      plan.contains("BroadcastExchange"),
      s"manifest side must broadcast:\n$plan")
    assert(!plan.contains("CartesianProduct") &&
      !plan.contains("BroadcastNestedLoopJoin"))
  }

  test("compacted read-back is a bare scan + final order (no extra " +
      "exchange, no join)") {
    val df = sources.Layout.qWriteCompact(spark, sf0001)
    val plan = planOf(df)
    assert(plan.contains("Scan parquet") && plan.contains("compact_"),
      s"must read the compacted layout back:\n$plan")
    assert(!plan.contains("Join"), s"identity read-back must not join:\n$plan")
    // exactly ONE exchange — the range partition for the total ORDER BY
    // (driver-contract ordering); the compaction itself happened at
    // write time, so the read pays nothing else
    assert("Exchange".r.findAllIn(plan).length <= 2, // Exchange + reuse tag
      s"read-back should carry only the order-by exchange:\n$plan")
    assert(plan.contains("rangepartitioning"),
      s"final sort should range-partition:\n$plan")
  }

  test("schema-evolution read merges both drops into ONE scan node") {
    val df = sources.Layout.qSchemaEvolution(spark, sf0001)
    val plan = planOf(df)
    // mergeSchema unions the footers at planning time: both drop dirs
    // feed a single parquet scan (shared file index), NOT a Union of two
    // scans with a cast — the shape that stays one stage at 100 TB
    assert("Scan parquet".r.findAllIn(plan).length == 1,
      s"expected one merged scan:\n$plan")
    assert(!plan.contains("Union"), s"no per-drop union:\n$plan")
    assert(plan.contains("lang"), s"merged schema must carry lang:\n$plan")
  }

  test("q_join_cbo's ANALYZE'd stats reorder the filtered dim ahead of " +
      "the fact pair") {
    val df = relational.ScaleOps.qJoinCbo(spark, sf0001)
    val leaves = df.queryExecution.optimizedPlan.collectLeaves()
      .map(_.toString)
    def idx(t: String): Int = leaves.indexWhere(_.contains(t))
    assert(idx("cbo_cust") >= 0 && idx("cbo_li") >= 0,
      s"expected catalog-table leaves, got: $leaves")
    // written fact-fact-first; CBO must hoist the ~50-row filtered dim
    assert(idx("cbo_cust") < idx("cbo_li"),
      s"stats-fed reorder should join the dim first: $leaves")
    assert(df.collect().nonEmpty)
  }

  test("q_text_quality's observe node reports scan metrics with no " +
      "second job") {
    val df = text.Analysis.qTextQuality(spark, sf0001)
    // collect() (not count()) — count builds its OWN QueryExecution; the
    // observe accumulators live in this one's executed plan
    val n = df.collect().length.toLong
    val metrics = df.queryExecution.observedMetrics(
      text.Analysis.QualityMetricsName)
    assert(metrics.getAs[Long]("n_docs") == n,
      s"observer row count should equal the output count, got $metrics")
    assert(metrics.getAs[Long]("n_empty_text") == 0L)
    assert(metrics.getAs[Long]("min_chars") > 0L &&
      metrics.getAs[Long]("max_chars") >= metrics.getAs[Long]("min_chars"))
  }

  test("incremental minhash near-dup joins hash-keyed bands only — no " +
      "cartesian, no today×prior text join") {
    val df = llm.DedupVariants.qDedupMinhashIncremental(spark, sf0001)
    val plan = planOf(df)
    assert(!plan.contains("CartesianProduct") &&
      !plan.contains("BroadcastNestedLoopJoin"),
      s"all joins must be hash/merge equi-joins:\n$plan")
    // agreement with the symmetric pair key restricted to (today, prior):
    // every reported prior-dup must appear in q_dedup_minhash's pair list
    val pairs = llm.DedupVariants.qDedupMinhash(spark, sf0001)
      .select("id_a", "id_b").collect()
      .flatMap(r => Seq((r.getLong(0), r.getLong(1)),
        (r.getLong(1), r.getLong(0)))).toSet
    val rows = df.collect()
    rows.foreach { r =>
      val (t, n, minP) = (r.getLong(0), r.getLong(1), r.getLong(3))
      assert(t % 4 == 3, s"today slice only, got doc $t")
      assert(minP % 4 != 3, s"prior slice only, got manifest doc $minP")
      assert(pairs.contains((t, minP)),
        s"($t,$minP) missing from the symmetric pair key")
      val expectedN = pairs.count { case (a, b) => a == t && b % 4 != 3 }
      assert(n == expectedN, s"doc $t: $n prior dups vs $expectedN")
    }
  }

  test("budget sampling's two-pass prefix-sum equals the single-reducer " +
      "window and broadcasts the bucket offsets") {
    val df = llm.Curation.qSampleBudget(spark, sf0001)
    val plan = planOf(df)
    // the offset manifest (O(langs×8) rows) must broadcast back — the
    // corpus side never shuffles for the join
    assert(plan.contains("BroadcastHashJoin"),
      s"expected the offset-manifest broadcast in:\n$plan")
    // exactness: the decomposition equals the naive per-lang window
    val h = expr(
      "cast(conv(substring(md5(cast(doc_id as string)), 1, 8), 16, 10)" +
        " as bigint)")
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy("lang").orderBy(col("h"), col("doc_id"))
      .rowsBetween(org.apache.spark.sql.expressions.Window
        .unboundedPreceding, org.apache.spark.sql.expressions.Window
        .currentRow)
    val naive = Tables.documents(spark, sf0001)
      .select(col("doc_id"), col("lang"),
        size(split(col("text"), " ")).cast("long").as("tok"), h.as("h"))
      .withColumn("cum_before", sum("tok").over(w) - col("tok"))
      .filter(col("cum_before") < 5000L)
      .select("doc_id", "lang", "tok", "cum_before")
      .orderBy("doc_id")
    assert(df.collect().map(_.toSeq).toSeq ==
      naive.collect().map(_.toSeq).toSeq)
  }

  test("lateral top-k subquery decorrelates to a window rank, not " +
      "per-row re-execution") {
    val plan = planOf(relational.Extended.qJoinLateral(spark, sf0001))
    assert(plan.contains("Window"),
      s"expected the decorrelated rank window in:\n$plan")
    assert(!plan.contains("BroadcastNestedLoopJoin") &&
      !plan.contains("CartesianProduct"),
      s"lateral must not plan as an outer-row-driven loop:\n$plan")
  }

  test("null-safe join stays a hash equi-join (null is a key value)") {
    val plan = planOf(relational.Extended.qJoinNullSafe(spark, sf0001))
    assert(plan.contains("HashJoin"),
      s"<=> must compile to a hashable key:\n$plan")
    assert(!plan.contains("BroadcastNestedLoopJoin") &&
      !plan.contains("CartesianProduct"))
  }

  test("unpivot is a per-row Expand — no shuffle to melt") {
    val df = relational.Extended.qUnpivot(spark, sf0001)
    val plan = planOf(df)
    assert(plan.contains("Expand"), s"expected Expand in:\n$plan")
    // exactly one exchange: the final ORDER BY's range partition — the
    // melt itself must not shuffle
    val exchanges = "Exchange".r.findAllIn(plan).length
    assert(exchanges <= 1, s"melt must not shuffle, got $exchanges in:\n$plan")
  }

  test("native as-of join plans as the custom exec with co-partitioned, " +
      "co-sorted children — no window, no union") {
    val plan = planOf(relational.Joins.qJoinAsofNative(spark, sf0001))
    // SparkPlan.nodeName strips the Exec suffix: the node prints "AsOfJoin"
    assert(plan.contains("AsOfJoin"),
      s"expected the custom operator in:\n$plan")
    assert(!plan.contains("Window") && !plan.contains("Union"),
      s"the native form must not fall back to the union+window encoding:\n$plan")
    // EnsureRequirements gave it SMJ-shape children: a hash exchange and
    // a sort per side
    assert("hashpartitioning".r.findAllIn(plan.toLowerCase).length >= 2,
      s"both sides must cluster on the key:\n$plan")
  }

  test("PushFilterThroughAsOfJoin moves a post-join probe predicate below " +
      "the operator and into the parquet scan") {
    val ev = graft.Tables.events(spark, sf0001)
    val clicks = ev.filter(col("event_type") === "click")
      .select(col("event_id").as("probe_id"), col("user_id"), col("ts"))
    val purchases = ev.filter(col("event_type") === "purchase")
      .select(col("user_id").as("b_user"), col("ts").as("b_ts"),
        col("event_id").as("m_id"), col("value").as("m_value"))
    val joined = plans.AsOf.asof(clicks, purchases,
      "user_id", "b_user", "ts", "b_ts", Seq("m_id"))
      .filter(col("probe_id") % 2 === 0) // written AFTER the as-of join
    val optimized = joined.queryExecution.optimizedPlan.toString
    // the probe-only conjunct must sit BELOW AsOfJoinPlan after the rule
    val joinIdx = optimized.indexOf("AsOfJoinPlan")
    val filtIdx = optimized.indexOf("% 2")
    assert(joinIdx >= 0, s"missing custom node in:\n$optimized")
    assert(filtIdx > joinIdx,
      s"probe filter must be below (after, in tree order) the join:\n$optimized")
    // and the scan-stage pushdown carries it the rest of the way (through
    // the probe_id alias, onto event_id): the filter prunes BEFORE the
    // key shuffle
    val physical = planOf(joined)
    val exchIdx = physical.indexOf("Exchange hashpartitioning(user_id")
    val physFiltIdx = physical.indexOf("% 2")
    assert(exchIdx >= 0 && physFiltIdx > exchIdx,
      s"probe filter must run before the probe-side exchange:\n$physical")
  }

  test("q_dedup_near's exploded bucket join plans as BroadcastHashJoin " +
      "(the load-bearing cache's InMemoryRelation statistics)") {
    // The cache() in nearDupPairsPlan is what gives the planner size
    // statistics for approxSimilarityJoin's self-join of the exploded
    // hash buckets; losing it (e.g. a localCheckpoint swap, or a Spark
    // upgrade changing LogicalRDD stats) degrades the join to sort-merge
    // over interpreted vector-key ordering — the documented 6 s → 230 s
    // cliff at sf0.1 (VERDICT r16 item 4 pins it here instead of in a
    // comment).
    val (featured, pairs) = llm.Dedup.nearDupPairsPlan(spark, sf0001)
    try {
      pairs.count() // materialize so any adaptive re-plan is final
      val plan = planOf(pairs)
      assert(plan.contains("BroadcastHashJoin"),
        s"bucket self-join lost its broadcast:\n$plan")
      assert(!plan.contains("SortMergeJoin"),
        s"bucket self-join degraded to sort-merge:\n$plan")
      assert(plan.contains("InMemoryTableScan"),
        s"featured cache is not feeding the join:\n$plan")
    } finally { featured.unpersist(): Unit }
  }

  test("TxTable CDC and delete keep their commit-bounded sides on " +
      "broadcasts (never a table-sized shuffle)") {
    // the scale claim behind q_table_changes / the delete rewrite: every
    // join partner is COMMIT-sized (changed files, request manifest), so
    // it must ride a broadcast — a sort-merge here would mean a
    // table-sized shuffle snuck into what is sold as O(commit) work
    val changes = planOf(sources.TxTable.qTableChanges(spark, sf0001))
    assert(changes.contains("BroadcastHashJoin"),
      s"CDC anti-joins lost their broadcast:\n$changes")
    assert(!changes.contains("SortMergeJoin"),
      s"CDC anti-join degraded to sort-merge:\n$changes")
    // the delete/merge rewrites execute eagerly inside their commits, so
    // their join plans are pinned structurally in LayoutSpec instead;
    // their broadcast() hints are explicit in rewriteCommit/mergeCommit
  }

  test("TxTable DSv2 scan statistics drive the optimizer: a stats-" +
      "pruned txtable side joins as the BROADCAST side of a big join") {
    // the point of SupportsReportStatistics returning POST-skipping
    // cardinality: after pruning, the scan is small enough to
    // broadcast, and Catalyst must see that — a join sized from raw
    // table bytes would sort-merge
    import org.apache.spark.sql.functions._
    val root = graft.Scratch.dir("txtable", "spec_dsv2stats")
    sources.TxTable.init(root)
    val orders = Tables.orders(spark, sf0001)
      .select("o_orderkey", "o_custkey", "o_totalprice")
    sources.TxTable.append(spark, root,
      orders.repartitionByRange(8, col("o_custkey"))): Unit
    val cut = orders.agg(max("o_custkey")).head()
      .getAs[Number](0).longValue / 10
    val pruned = spark.read.format("txtable").load(root)
      .filter(col("o_custkey") <= cut)
    val big = Tables.lineitem(spark, sf0001)
    val joined = big.join(pruned,
      big("l_orderkey") === pruned("o_orderkey"))
    val plan = joined.queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastHashJoin"),
      s"pruned DSv2 scan must broadcast (post-skipping stats):\n$plan")
    assert(plan.contains("files planned"),
      s"expected the txtable scan description in:\n$plan")
  }

  test("a catalog partition-predicate SELECT plans exactly the " +
      "matching partition's files (the q_table_ctas read shape, " +
      "round 19)") {
    import org.apache.spark.sql.functions._
    val wh = graft.Scratch.dir("txtable", "spec_planctas")
    graft.Scratch.deleteRec(new java.io.File(wh))
    new java.io.File(wh).mkdirs()
    spark.conf.set("spark.sql.catalog.pln_tx",
      classOf[graft.streaming.TxTableCatalog].getName)
    spark.conf.set("spark.sql.catalog.pln_tx.warehouse", wh)
    spark.sql("CREATE NAMESPACE IF NOT EXISTS pln_tx.db")
    spark.range(0, 4000)
      .select(col("id").as("k"), (col("id") % 4).cast("int").as("b"))
      .createOrReplaceTempView("pln_src")
    spark.sql("""CREATE TABLE pln_tx.db.t PARTITIONED BY (b) AS
                |SELECT * FROM pln_src""".stripMargin)
    val df = spark.sql("SELECT * FROM pln_tx.db.t WHERE b = 2")
    val plan = df.queryExecution.executedPlan.toString
    // the scan self-reports files planned < files listed, and the
    // partition predicate rode pushFilters into the description
    val m = "files planned (\\d+)/(\\d+)".r.findFirstMatchIn(plan)
    assert(m.isDefined, s"expected the txtable scan description in:\n$plan")
    assert(m.get.group(1).toInt < m.get.group(2).toInt &&
      m.get.group(1).toInt > 0,
      s"partition predicate must prune the plan: ${m.get.matched}")
    assert(df.count() == 1000L)
    spark.sql("DROP TABLE pln_tx.db.t")
  }

  test("ts_resample aggregates the corpus before touching the grid (the " +
      "LOCF window runs over O(calendar) rows)") {
    val plan = planOf(relational.TimeSeries.qTsResample(spark, sf0001))
    // the events-side aggregate must be partial+final (map-side combine)
    assert(plan.contains("partial_count") || plan.contains("partial"),
      s"expected a partial aggregate below the grid join in:\n$plan")
    // the window partitions by type — never a global single-partition sort
    assert(!plan.contains("SinglePartition$"),
      s"LOCF window must partition by event_type:\n$plan")
  }
}
