package graft

import org.scalatest.funsuite.AnyFunSuite

/** Fixture-schema guard (round 12): the harness regenerates
  * /root/testdata between rounds and has already drifted once (events.ts
  * TIMESTAMP(NANOS) → timestamp[us], round 11 — 26 keys and 14 tests
  * failed with one cryptic analysis error each). This suite turns the
  * next drift into ONE readable failure naming the exact column, at every
  * scale factor the driver uses. */
class TablesSpec extends AnyFunSuite with SparkFixture {

  private val sfDirs =
    Seq(sf0001, sf001, "/root/testdata/sf0.1").filter(d =>
      new java.io.File(d).isDirectory)

  test("every harness table loads with the schema the operators assume " +
      "(drift probe, all scale factors)") {
    val drift = sfDirs.flatMap(d =>
      Tables.schemaDrift(spark, d).map(m => s"$d: $m"))
    assert(drift.isEmpty,
      s"\nFIXTURE SCHEMA DRIFT — ${drift.size} column(s):\n  " +
        drift.mkString("\n  ") +
        "\nThe testdata fixtures changed shape under the loaders. Adapt " +
        "Tables.scala (loader or expectedSchemas) before trusting any " +
        "other failure in this run.")
  }

  test("events.ts normalizes to a session-TZ timestamp on every fixture " +
      "generation (the round-11 drift regression)") {
    import org.apache.spark.sql.types.TimestampType
    sfDirs.foreach { d =>
      val t = Tables.events(spark, d).schema("ts").dataType
      assert(t == TimestampType,
        s"$d: events.ts came out $t, expected TimestampType — the " +
          "adaptive loader in Tables.events no longer covers this " +
          "fixture's physical encoding")
    }
  }
}
