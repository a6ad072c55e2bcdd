package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Join-algebra cross-checks (SURVEY §5.3): different operators whose
  * results are related by algebraic identities must agree — a bug in any
  * one of them breaks an identity. */
class JoinAlgebraSpec extends AnyFunSuite with SparkFixture {

  test("semi-join customers == distinct custkeys of inner join") {
    val semi = relational.Joins.qJoinSemi(spark, sf0001)
      .select("c_custkey").collect().map(_.getLong(0)).toSet
    val inner = relational.Joins.qJoinInner(spark, sf0001)
      .select("c_custkey").distinct().collect().map(_.getLong(0)).toSet
    assert(semi == inner)
  }

  test("anti-join == customers EXCEPT urgent-order-owners (q_set_except)") {
    // both keys use the same URGENT-filtered probe side (VERDICT r17:
    // the unfiltered probe made the anti set empty at the oracle SF —
    // this identity now also proves both sets are non-empty)
    val anti = relational.Joins.qJoinAnti(spark, sf0001)
      .select("c_custkey").collect().map(_.getLong(0)).toSet
    val except = relational.Core.qSetExcept(spark, sf0001)
      .collect().map(_.getLong(0)).toSet
    assert(anti == except)
    assert(anti.nonEmpty, "the anti set must be structurally non-empty")
  }

  test("urgent-semi + anti partition the customer table") {
    // the partition identity holds against the SAME probe side the anti
    // key uses: customers with ≥1 urgent order + customers with none
    val nCust = Tables.customer(spark, sf0001).count()
    val nUrgentSemi = Tables.customer(spark, sf0001)
      .join(Tables.orders(spark, sf0001)
          .filter(col("o_orderpriority") === "1-URGENT"),
        col("c_custkey") === col("o_custkey"), "left_semi")
      .count()
    val nAnti = relational.Joins.qJoinAnti(spark, sf0001).count()
    assert(nUrgentSemi + nAnti == nCust)
    assert(nAnti > 0 && nUrgentSemi > 0)
  }

  test("left join row count == inner + orderless customers") {
    val left = relational.Joins.qJoinLeft(spark, sf0001)
    val inner = relational.Joins.qJoinInner(spark, sf0001)
    val nOrderless = Tables.customer(spark, sf0001)
      .join(Tables.orders(spark, sf0001),
        col("c_custkey") === col("o_custkey"), "left_anti")
      .count()
    assert(left.count() == inner.count() + nOrderless)
  }

  test("left and right joins of the same tables agree") {
    val l = relational.Joins.qJoinLeft(spark, sf0001).collect()
    val r = relational.Joins.qJoinRight(spark, sf0001).collect()
    assert(l.sameElements(r))
  }

  test("cross join cardinality is |region| * |nation|") {
    val n = relational.Joins.qJoinCross(spark, sf0001).count()
    assert(n == Tables.region(spark, sf0001).count() *
      Tables.nation(spark, sf0001).count())
  }

  test("theta join emits only same-brand strictly-increasing size pairs") {
    val rows = relational.Joins.qJoinTheta(spark, sf0001)
      .select("size1", "size2").collect()
    assert(rows.forall(r => r.getInt(0) < r.getInt(1)))
  }

  test("set-op consistency against the urgent-filtered except") {
    val u = relational.Core.qSetUnion(spark, sf0001).count()
    val i = relational.Core.qSetIntersect(spark, sf0001).count()
    val e = relational.Core.qSetExcept(spark, sf0001).count()
    val nUrgent = Tables.orders(spark, sf0001)
      .filter(col("o_orderpriority") === "1-URGENT")
      .select("o_custkey").distinct().count()
    // orders ⊆ customer on custkey ⇒ union == customers (== i + full
    // except); the urgent-filtered except removes exactly the distinct
    // urgent custkeys, all of which are customers
    assert(e == u - nUrgent)
    assert(i + e >= u, "urgent except is a superset of the full except")
  }

  test("as-of join matches a hand-computed per-user scan") {
    val ev = Tables.events(spark, sf0001)
      .select("event_id", "user_id", "event_type", "ts", "value").collect()
      .map { r =>
        val i = r.getTimestamp(3).toInstant
        val us = i.getEpochSecond * 1000000L + i.getNano / 1000L
        (r.getLong(0), r.getLong(1), r.getString(2), us, r.getDouble(4))
      }
    val purchases = ev.filter(_._3 == "purchase")
    val expected = ev.filter(_._3 == "click").map { c =>
      val prior = purchases.filter(p => p._2 == c._2 && p._4 <= c._4)
      val best =
        if (prior.isEmpty) None
        else Some(prior.maxBy(p => (p._4, p._1)))
      (c._1, best.map(_._1))
    }.toMap
    val got = relational.Joins.qJoinAsof(spark, sf0001).collect()
      .map(r => (r.getLong(0),
        if (r.isNullAt(3)) None else Some(r.getLong(3)))).toMap
    assert(got == expected)
  }

  test("native as-of join == union+window as-of join, row for row") {
    def rows(df: org.apache.spark.sql.DataFrame) = df.collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getTimestamp(2),
        if (r.isNullAt(3)) None else Some(r.getLong(3)),
        if (r.isNullAt(4)) None else Some(r.getDouble(4)))).toSeq
    val native = rows(relational.Joins.qJoinAsofNative(spark, sf0001))
    val window = rows(relational.Joins.qJoinAsof(spark, sf0001))
    assert(native.nonEmpty && native == window)
  }

  test("forward as-of == brute-force min-struct over the range join") {
    import org.apache.spark.sql.functions._
    val ev = Tables.events(spark, sf0001)
    val clicks = ev.filter(col("event_type") === "click")
      .select(col("event_id").as("probe_id"), col("user_id"),
        col("ts"))
    val purchases = ev.filter(col("event_type") === "purchase")
      .select(col("user_id").as("b_user"), col("ts").as("b_ts"),
        col("event_id").as("m_id"))
    // independent oracle: range join + min(struct(ts, id)) per click
    val expected = clicks
      .join(purchases, col("user_id") === col("b_user") &&
        col("b_ts") >= col("ts"), "left")
      .groupBy("probe_id")
      .agg(min(struct(col("b_ts"), col("m_id"))).as("m"))
      .select(col("probe_id"), col("m.m_id").as("m_id"))
      .collect()
      .map(r => r.getLong(0) ->
        (if (r.isNullAt(1)) None else Some(r.getLong(1)))).toMap
    val got = relational.Joins.qJoinAsofFwd(spark, sf0001)
      .collect()
      .map(r => r.getLong(0) ->
        (if (r.isNullAt(3)) None else Some(r.getLong(3)))).toMap
    assert(got.nonEmpty && got == expected)
    assert(got.values.exists(_.isEmpty),
      "fixture should include clicks with no later purchase")
  }
}
