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
  *
  * Float determinism vs the DuckDB oracle (SURVEY §7.4.1): summation order
  * differs between engines, so every aggregated double is rounded. Rounding
  * scale is chosen so the TRUE value sits on the rounding grid (prices have
  * 2 decimals -> sums of prices are 2dp-exact -> round at 2dp is safe;
  * price*(1-disc) is 4dp-exact -> round at 4dp), keeping both engines' tiny
  * summation errors strictly inside the same bucket.
  */
object Aggregates {

  /** q_agg_hash — TPC-H Q1 shape: the flagship grouped hash aggregate. */
  def qAggHash(s: SparkSession, dir: String): DataFrame =
    Tables.lineitem(s, dir)
      .filter(col("l_shipdate") <= lit("1998-09-02").cast("timestamp"))
      .groupBy("l_returnflag", "l_linestatus")
      .agg(
        sum("l_quantity").as("sum_qty"),
        round(sum("l_extendedprice"), 2).as("sum_base_price"),
        round(sum(col("l_extendedprice") * (lit(1.0) - col("l_discount"))), 4)
          .as("sum_disc_price"),
        round(avg("l_quantity"), 6).as("avg_qty"),
        round(avg("l_extendedprice"), 6).as("avg_price"),
        count(lit(1)).as("count_order"))
      .orderBy("l_returnflag", "l_linestatus")

  val queries: Map[String, Q] = Map(
    "q_agg_hash" -> (qAggHash _)
  )

  val oracle: Map[String, String] = Map(
    "q_agg_hash" ->
      """SELECT l_returnflag, l_linestatus,
        |  SUM(l_quantity) AS sum_qty,
        |  ROUND(SUM(l_extendedprice), 2) AS sum_base_price,
        |  ROUND(SUM(l_extendedprice * (1.0 - l_discount)), 4) AS sum_disc_price,
        |  ROUND(AVG(l_quantity), 6) AS avg_qty,
        |  ROUND(AVG(l_extendedprice), 6) AS avg_price,
        |  COUNT(*) AS count_order
        |FROM lineitem
        |WHERE l_shipdate <= TIMESTAMP '1998-09-02'
        |GROUP BY l_returnflag, l_linestatus
        |ORDER BY l_returnflag, l_linestatus""".stripMargin
  )
}
