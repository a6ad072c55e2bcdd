package graft.udf

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Aggregator
import org.apache.spark.sql.functions._
import graft.{Q, Tables}

/** UDF / UDAF / UDTF extension surface (SURVEY §2.12).
  *
  * These exist to prove the native extension points; the codebase's rule
  * stands: prefer built-in expressions (codegen'd, Catalyst-visible) —
  * a UDF is an optimization barrier (no pushdown through it, no codegen
  * inside it). Each key's semantics are still SQL-expressible so the
  * DuckDB oracle verifies them.
  *
  * Scale notes: the scalar UDF and the typed flatMap are
  * per-row/partition-local (no shuffle added); the UDAF is a proper
  * Aggregator with a mergeable buffer, so it partial-aggregates map-side
  * exactly like a built-in (shuffle O(groups)).
  */
object Extensions {

  /** q_udf_scalar — token-count bucket label via a registered Scala UDF. */
  def qUdfScalar(s: SparkSession, dir: String): DataFrame = {
    val bucket = udf((text: String) => {
      val n = text.split(" ").length
      if (n < 20) "short" else if (n < 60) "mid" else "long"
    })
    Tables.documents(s, dir)
      .select(col("doc_id"), bucket(col("text")).as("bucket"))
      .orderBy("doc_id")
  }

  /** Geometric mean as a typed Aggregator: buffer = (Σ ln x, n), merge is
    * associative → map-side partial aggregation works like a built-in. */
  private object GeoMean
      extends Aggregator[Double, (Double, Long), Double] {
    def zero: (Double, Long) = (0.0, 0L)
    def reduce(b: (Double, Long), x: Double): (Double, Long) =
      (b._1 + math.log(x), b._2 + 1)
    def merge(a: (Double, Long), b: (Double, Long)): (Double, Long) =
      (a._1 + b._1, a._2 + b._2)
    def finish(b: (Double, Long)): Double =
      if (b._2 == 0) Double.NaN else math.exp(b._1 / b._2)
    def bufferEncoder: org.apache.spark.sql.Encoder[(Double, Long)] =
      org.apache.spark.sql.Encoders.tuple(
        org.apache.spark.sql.Encoders.scalaDouble,
        org.apache.spark.sql.Encoders.scalaLong)
    def outputEncoder: org.apache.spark.sql.Encoder[Double] =
      org.apache.spark.sql.Encoders.scalaDouble
  }

  /** q_udaf_gmean — geometric mean of l_extendedprice per returnflag via
    * a custom typed Aggregator (≡ exp(avg(ln x))). */
  def qUdafGmean(s: SparkSession, dir: String): DataFrame = {
    val gm = udaf(GeoMean)
    Tables.lineitem(s, dir)
      .groupBy("l_returnflag")
      .agg(round(gm(col("l_extendedprice")), 6).as("gmean_price"))
      .orderBy("l_returnflag")
  }

  /** q_udtf_expr — generator surface as a typed Dataset.flatMap: one row
    * per character-bigram of p_name, then corpus counts. */
  def qUdtfExpr(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    Tables.part(s, dir)
      .select(col("p_name")).as[String]
      .flatMap(name => name.sliding(2).filter(_.length == 2))
      .toDF("bigram")
      .groupBy("bigram").agg(count(lit(1)).as("cnt"))
      .orderBy("bigram")
  }

  val queries: Map[String, Q] = Map(
    "q_udf_scalar" -> (qUdfScalar _),
    "q_udaf_gmean" -> (qUdafGmean _),
    "q_udtf_expr" -> (qUdtfExpr _))

  val oracle: Map[String, String] = Map(
    "q_udf_scalar" ->
      """SELECT doc_id,
        |  CASE WHEN len(string_split(text, ' ')) < 20 THEN 'short'
        |       WHEN len(string_split(text, ' ')) < 60 THEN 'mid'
        |       ELSE 'long' END AS bucket
        |FROM documents ORDER BY doc_id""".stripMargin,
    "q_udaf_gmean" ->
      """SELECT l_returnflag,
        |  ROUND(EXP(AVG(LN(l_extendedprice))), 6) AS gmean_price
        |FROM lineitem
        |GROUP BY l_returnflag
        |ORDER BY l_returnflag""".stripMargin,
    "q_udtf_expr" ->
      """SELECT bigram, COUNT(*) AS cnt
        |FROM (SELECT unnest(list_transform(range(1, length(p_name)),
        |        i -> substring(p_name, i, 2))) AS bigram
        |      FROM part)
        |GROUP BY bigram
        |ORDER BY bigram""".stripMargin)
}
