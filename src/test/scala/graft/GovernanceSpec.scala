package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Semantic contracts for the governance operators (SURVEY §2.13 round 6)
  * beyond the DuckDB oracle hash: properties the oracle can't express
  * (set relations between operators, invariants under parameter change). */
class GovernanceSpec extends AnyFunSuite with SparkFixture {

  test("decontam flags only training docs, never the eval slice") {
    val out = llm.Governance.qDecontamNgram(spark, sf001).collect()
    assert(out.nonEmpty) // the constructed near-dups leak across the split
    assert(out.forall(_.getLong(0) % 10 != 0))
    // overlap counts are sane: 0 < n_hit <= n_grams
    assert(out.forall(r => r.getLong(1) > 0 && r.getLong(1) <= r.getLong(2)))
  }

  test("redaction removes every PII match it counted") {
    val redacted = llm.Governance.qTextRedact(spark, sf001)
    // every doc got the synthetic email+phone appended, so every doc
    // must report >= 1 of each
    assert(redacted.filter(col("n_emails") < 1 || col("n_phones") < 1)
      .isEmpty)
    // rebuild the redacted text the query hashed and assert no residual
    // PII pattern survives the scrub
    val residual = Tables.documents(spark, sf001)
      .withColumn("pii_text", concat(
        col("text"), lit(" contact user"), col("doc_id").cast("string"),
        lit("@example.com or 555-"),
        lpad((col("doc_id") % 10000).cast("string"), 4, "0")))
      .withColumn("scrubbed", regexp_replace(
        regexp_replace(col("pii_text"),
          "[a-z0-9]+@[a-z]+\\.[a-z]+", "<EMAIL>"),
        "[0-9]{3}-[0-9]{4}", "<PHONE>"))
      .filter(col("scrubbed").rlike("[a-z0-9]+@[a-z]+\\.[a-z]+") ||
        col("scrubbed").rlike("[0-9]{3}-[0-9]{4}"))
    assert(residual.isEmpty)
  }

  test("temperature sampling keeps the minority language whole and " +
    "downsamples the majority") {
    val docs = Tables.documents(spark, sf001)
    val before = docs.groupBy("lang").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    val after = llm.Governance.qSampleTemperature(spark, sf001)
      .groupBy("lang").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    val minority = before.minBy(_._2)._1
    val majority = before.maxBy(_._2)._1
    // a_minority = 1.0 exactly -> nothing dropped
    assert(after(minority) == before(minority))
    // the majority must actually shrink, and the KEPT fraction must land
    // near its analytic acceptance rate (binomial-ish tolerance)
    val aMaj = math.pow(
      before(minority).toDouble / before(majority), 0.3)
    val kept = after(majority).toDouble / before(majority)
    assert(kept < 1.0 && math.abs(kept - aMaj) < 0.15,
      s"majority kept=$kept expected~$aMaj")
  }

  test("shard assignment partitions the corpus completely and evenly-ish") {
    val shards = llm.Governance.qShardAssign(spark, sf001).collect()
    assert(shards.length == 16)
    val total = shards.map(_.getLong(1)).sum
    assert(total == Tables.documents(spark, sf001).count())
    // md5-uniformity: no shard should be pathologically hot (>3x mean)
    val mean = total.toDouble / 16
    assert(shards.forall(_.getLong(1) < 3 * mean))
  }
}
