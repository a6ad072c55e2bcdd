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

  test("events loader still handles a TIMESTAMP(NANOS) fixture (legacy " +
      "long read + floor to microseconds, matching DuckDB)") {
    // src/test/resources holds a 20-row parquet written with ns-precision
    // timestamps carrying sub-µs components (…_500 ns + 999), so this
    // pins BOTH the AnalysisException → legacy-conf retry dispatch and
    // the ns→µs floor — the branch is dead code against the current µs
    // fixtures and would otherwise rot unnoticed until the harness
    // regenerates nanos again.
    import org.apache.spark.sql.types.TimestampType
    val dir = "src/test/resources/graft/nanos"
    assert(new java.io.File(s"$dir/events.parquet").isFile,
      s"nanos fixture missing under $dir")
    val key = "spark.sql.legacy.parquet.nanosAsLong"
    val prev = spark.conf.getOption(key)
    try {
      spark.conf.unset(key)
      val df = Tables.events(spark, dir)
      assert(df.schema("ts").dataType == TimestampType)
      val us = df.orderBy("event_id")
        .selectExpr("unix_micros(ts)").collect().map(_.getLong(0))
      val base = 1767225600000000L // 2026-01-01T00:00:00Z in µs
      val expected = (0 until 20).map(i =>
        (base * 1000L + i * 1000500L + 999L) / 1000L)
      assert(us.toSeq == expected,
        s"ns→µs floor drifted: got ${us.take(3).toSeq}, " +
          s"expected ${expected.take(3)}")
    } finally prev.fold(spark.conf.unset(key))(spark.conf.set(key, _))
  }

  test("every harness table has a drift-probe expectation " +
      "(expectedSchemas covers Tables.names)") {
    assert(Tables.expectedSchemas.map(_._1) == Tables.names,
      "a table in Tables.names lacks an expectedSchemas entry (or the " +
        "orders differ) — it would silently receive zero drift protection")
  }
}
