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
}
