package graft.relational

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.{Q, Tables}

/** Row-level operators (SURVEY §2.2), sort/limit (§2.6), set ops (§2.7).
  *
  * Scale notes (100 TB posture):
  *  - Projections/filters stay inside whole-stage codegen and push into the
  *    vectorized parquet scan (PushedFilters / pruned ReadSchema) — they cost
  *    one scan, no shuffle, at any scale.
  *  - q_sample_det filters on `key % 10` rather than `sample()`: same
  *    pushdown-friendly shape, and deterministic across engines/partitions —
  *    seeded `sample()` depends on Spark-internal RNG + partitioning.
  *  - The global sorts exist only to satisfy the oracle's total-order
  *    contract; q_limit_topk/q_offset_page plan as TakeOrderedAndProject
  *    (per-partition heap + driver merge of k rows), NOT a full sort.
  *  - Set ops are hash aggregations/joins on the key column — partial
  *    aggregation bounds shuffle volume by distinct keys.
  */
object Core {

  /** q_project_compute — projection + derived columns, keyed per lineitem. */
  def qProjectCompute(s: SparkSession, dir: String): DataFrame =
    Tables.lineitem(s, dir)
      .select(
        col("l_orderkey"), col("l_linenumber"),
        col("l_extendedprice"), col("l_discount"),
        round(col("l_extendedprice") * (lit(1.0) - col("l_discount")), 4)
          .as("revenue"),
        (col("l_quantity") * 2).as("qty_x2"))
      // (l_orderkey, l_linenumber) is NOT unique in the harness data —
      // total order needs every output column (ties then carry identical
      // rows, which compare equal positionally on both engines).
      .orderBy("l_orderkey", "l_linenumber", "l_extendedprice",
        "l_discount", "qty_x2")

  /** q_filter_pred — compound predicate: AND/OR/NOT, IN, BETWEEN, LIKE,
    * IS NOT NULL. All sargable pieces push into the scan. */
  def qFilterPred(s: SparkSession, dir: String): DataFrame =
    Tables.lineitem(s, dir)
      .filter(
        (col("l_returnflag").isin("A", "R") &&
          col("l_quantity").between(10, 20) &&
          col("l_shipdate").isNotNull &&
          !(col("l_discount") > 0.05)) ||
        (col("l_returnflag") === "N" && col("l_linestatus").like("%F%")))
      .select("l_orderkey", "l_linenumber", "l_returnflag", "l_linestatus",
        "l_quantity", "l_discount")
      .orderBy("l_orderkey", "l_linenumber", "l_returnflag", "l_linestatus",
        "l_quantity", "l_discount")

  /** q_distinct — duplicate elimination on a low-cardinality pair. */
  def qDistinct(s: SparkSession, dir: String): DataFrame =
    Tables.lineitem(s, dir)
      .select("l_returnflag", "l_linestatus")
      .distinct()
      .orderBy("l_returnflag", "l_linestatus")

  /** q_sample_det — deterministic ~10% sample via key modulo (SURVEY §2.2:
    * engine-reproducible, unlike seeded sample()). */
  def qSampleDet(s: SparkSession, dir: String): DataFrame =
    Tables.lineitem(s, dir)
      .filter(col("l_orderkey") % 10 === 0)
      .select("l_orderkey", "l_linenumber", "l_quantity")
      .orderBy("l_orderkey", "l_linenumber", "l_quantity")

  /** q_sort_multi — multi-key sort with mixed direction and explicit null
    * placement. */
  def qSortMulti(s: SparkSession, dir: String): DataFrame =
    Tables.orders(s, dir)
      .select("o_orderkey", "o_orderstatus", "o_totalprice")
      .orderBy(col("o_orderstatus").asc, col("o_totalprice").desc_nulls_last,
        col("o_orderkey").asc)

  /** q_limit_topk — global top-25 by price; plans TakeOrderedAndProject
    * (partition-local heaps, no full sort) — the at-scale top-k shape. */
  def qLimitTopk(s: SparkSession, dir: String): DataFrame =
    Tables.lineitem(s, dir)
      .select("l_orderkey", "l_linenumber", "l_extendedprice")
      .orderBy(col("l_extendedprice").desc, col("l_orderkey").asc,
        col("l_linenumber").asc)
      .limit(25)

  /** q_offset_page — pagination: rows 26–50 of the q_limit_topk order. */
  def qOffsetPage(s: SparkSession, dir: String): DataFrame =
    Tables.lineitem(s, dir)
      .select("l_orderkey", "l_linenumber", "l_extendedprice")
      .orderBy(col("l_extendedprice").desc, col("l_orderkey").asc,
        col("l_linenumber").asc)
      .offset(25)
      .limit(25)

  /** q_set_union — UNION (distinct) of custkeys from two tables; uses
    * unionByName so column resolution is positional-independent. */
  def qSetUnion(s: SparkSession, dir: String): DataFrame =
    Tables.orders(s, dir).select(col("o_custkey").as("custkey"))
      .unionByName(
        Tables.customer(s, dir).select(col("c_custkey").as("custkey")))
      .distinct()
      .orderBy("custkey")

  /** q_set_intersect — custkeys present in both customer and orders. */
  def qSetIntersect(s: SparkSession, dir: String): DataFrame =
    Tables.customer(s, dir).select(col("c_custkey").as("custkey"))
      .intersect(Tables.orders(s, dir).select(col("o_custkey").as("custkey")))
      .orderBy("custkey")

  /** q_set_except — customers minus those with an URGENT order
    * (cross-checks q_join_anti). The subtracted side is filtered to
    * priority 1-URGENT so the difference is structurally NON-EMPTY at
    * every harness SF — subtracting all order-holders returned zero rows
    * at the oracle SF, a vacuous content check (VERDICT r17). */
  def qSetExcept(s: SparkSession, dir: String): DataFrame =
    Tables.customer(s, dir).select(col("c_custkey").as("custkey"))
      .except(Tables.orders(s, dir)
        .filter(col("o_orderpriority") === "1-URGENT")
        .select(col("o_custkey").as("custkey")))
      .orderBy("custkey")

  val queries: Map[String, Q] = Map(
    "q_project_compute" -> (qProjectCompute _),
    "q_filter_pred" -> (qFilterPred _),
    "q_distinct" -> (qDistinct _),
    "q_sample_det" -> (qSampleDet _),
    "q_sort_multi" -> (qSortMulti _),
    "q_limit_topk" -> (qLimitTopk _),
    "q_offset_page" -> (qOffsetPage _),
    "q_set_union" -> (qSetUnion _),
    "q_set_intersect" -> (qSetIntersect _),
    "q_set_except" -> (qSetExcept _))

  val oracle: Map[String, String] = Map(
    "q_project_compute" ->
      """SELECT l_orderkey, l_linenumber, l_extendedprice, l_discount,
        |  ROUND(l_extendedprice * (1.0 - l_discount), 4) AS revenue,
        |  l_quantity * 2 AS qty_x2
        |FROM lineitem
        |ORDER BY l_orderkey, l_linenumber, l_extendedprice, l_discount,
        |  qty_x2""".stripMargin,
    "q_filter_pred" ->
      """SELECT l_orderkey, l_linenumber, l_returnflag, l_linestatus,
        |  l_quantity, l_discount
        |FROM lineitem
        |WHERE (l_returnflag IN ('A','R') AND l_quantity BETWEEN 10 AND 20
        |       AND l_shipdate IS NOT NULL AND NOT (l_discount > 0.05))
        |   OR (l_returnflag = 'N' AND l_linestatus LIKE '%F%')
        |ORDER BY l_orderkey, l_linenumber, l_returnflag, l_linestatus,
        |  l_quantity, l_discount""".stripMargin,
    "q_distinct" ->
      """SELECT DISTINCT l_returnflag, l_linestatus FROM lineitem
        |ORDER BY l_returnflag, l_linestatus""".stripMargin,
    "q_sample_det" ->
      """SELECT l_orderkey, l_linenumber, l_quantity FROM lineitem
        |WHERE l_orderkey % 10 = 0
        |ORDER BY l_orderkey, l_linenumber, l_quantity""".stripMargin,
    "q_sort_multi" ->
      """SELECT o_orderkey, o_orderstatus, o_totalprice FROM orders
        |ORDER BY o_orderstatus ASC, o_totalprice DESC NULLS LAST,
        |  o_orderkey ASC""".stripMargin,
    "q_limit_topk" ->
      """SELECT l_orderkey, l_linenumber, l_extendedprice FROM lineitem
        |ORDER BY l_extendedprice DESC, l_orderkey ASC, l_linenumber ASC
        |LIMIT 25""".stripMargin,
    "q_offset_page" ->
      """SELECT l_orderkey, l_linenumber, l_extendedprice FROM lineitem
        |ORDER BY l_extendedprice DESC, l_orderkey ASC, l_linenumber ASC
        |LIMIT 25 OFFSET 25""".stripMargin,
    "q_set_union" ->
      """SELECT o_custkey AS custkey FROM orders
        |UNION
        |SELECT c_custkey AS custkey FROM customer
        |ORDER BY custkey""".stripMargin,
    "q_set_intersect" ->
      """SELECT c_custkey AS custkey FROM customer
        |INTERSECT
        |SELECT o_custkey AS custkey FROM orders
        |ORDER BY custkey""".stripMargin,
    "q_set_except" ->
      """SELECT c_custkey AS custkey FROM customer
        |EXCEPT
        |SELECT o_custkey AS custkey FROM orders
        |WHERE o_orderpriority = '1-URGENT'
        |ORDER BY custkey""".stripMargin)
}
