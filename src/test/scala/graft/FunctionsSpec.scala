package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Native expression + extension-point coverage. */
class FunctionsSpec extends AnyFunSuite with SparkFixture {

  test("array_dot matches the interpreted higher-order dot product") {
    graft.functions.NativeFunctions.register(spark)
    val df = Tables.embeddings(spark, sf0001)
      .select(col("vec_id"),
        transform(col("embedding"), x => x.cast("double")).as("e"))
      .limit(50)
      .select(col("vec_id"),
        call_function("array_dot", col("e"), col("e")).as("native"),
        aggregate(zip_with(col("e"), col("e"), (x, y) => x * y),
          lit(0.0), (a, x) => a + x).as("interpreted"))
      .collect()
    assert(df.nonEmpty)
    // bit-identical, not just close: both accumulate left-to-right
    assert(df.forall(r => r.getDouble(1) == r.getDouble(2)))
  }

  test("array_dot handles nulls and length mismatch safely") {
    graft.functions.NativeFunctions.register(spark)
    val r = spark.sql(
      """SELECT array_dot(array(1.0d, 2.0d), array(3.0d, 4.0d, 99.0d)) a,
        |       array_dot(cast(null as array<double>), array(1.0d)) b"""
        .stripMargin).collect().head
    assert(r.getDouble(0) == 11.0)
    assert(r.isNullAt(1))
  }

  test("adc_distance matches the interpreted lookup-sum and handles " +
      "nulls/empties") {
    graft.functions.NativeFunctions.register(spark)
    // codes: one 0-based index per subspace; lut: nSub × nCent doubles.
    // Interpreted twin folds left-to-right like the native loop.
    val r = spark.sql(
      """SELECT
        |  adc_distance(array(1, 0, 2),
        |    array(0.0d, 1.0d, 2.0d,
        |          10.0d, 11.0d, 12.0d,
        |          20.0d, 21.0d, 22.0d)) AS a,
        |  adc_distance(cast(array() as array<int>),
        |    cast(array() as array<double>)) AS empty,
        |  adc_distance(cast(null as array<int>), array(1.0d)) AS n
        |""".stripMargin).collect().head
    // lut[0*3+1] + lut[1*3+0] + lut[2*3+2] = 1 + 10 + 22
    assert(r.getDouble(0) == 33.0)
    assert(r.getDouble(1) == 0.0)
    assert(r.isNullAt(2))
    // bit-equality against a driver-side recompute over real PQ shapes
    val rows = spark.range(64).selectExpr(
      "transform(sequence(0, 15), i -> cast((id + i) % 16 AS int)) AS codes",
      "transform(sequence(0, 255), i -> cast(i AS double) / 7.0d) AS lut")
      .selectExpr("codes", "lut",
        "adc_distance(codes, lut) AS native")
      .collect()
    rows.foreach { row =>
      val codes = row.getSeq[Int](0)
      val lut = row.getSeq[Double](1)
      var acc = 0.0
      codes.zipWithIndex.foreach { case (c, i) => acc += lut(i * 16 + c) }
      assert(row.getDouble(2) == acc)
    }
  }

  test("adc_distance rejects malformed inputs instead of reading " +
      "arbitrary unsafe-buffer memory") {
    graft.functions.NativeFunctions.register(spark)
    // a code outside [0, nCent): lut has 2 subspaces × 2 centroids, so
    // code 5 would index past the buffer without the guard (ADVICE r13)
    val oob = intercept[Exception] {
      spark.sql(
        "SELECT adc_distance(array(5, 0), array(1.0d, 2.0d, 3.0d, 4.0d))")
        .collect()
    }
    assert(oob.getMessage.contains("out of range") ||
      Option(oob.getCause).exists(_.getMessage.contains("out of range")))
    // lut length not a multiple of codes length
    val rem = intercept[Exception] {
      spark.sql(
        "SELECT adc_distance(array(0, 0, 0), array(1.0d, 2.0d, 3.0d, 4.0d))")
        .collect()
    }
    assert(rem.getMessage.contains("not a multiple") ||
      Option(rem.getCause).exists(_.getMessage.contains("not a multiple")))
  }

  test("collect_bounded == collect_list whenever the group is under the " +
    "bound, regardless of partitioning") {
    graft.functions.NativeFunctions.register(spark)
    // lineitem keyed by l_orderkey: many groups, sizes 1..7, spread over
    // 8 partitions so both update() and merge() paths run
    val li = Tables.lineitem(spark, sf0001)
      .select(col("l_orderkey").as("k"), col("l_linenumber").cast("bigint")
        .as("v"))
      .repartition(8)
    val both = li.groupBy("k")
      .agg(expr("sort_array(collect_bounded(v, 100))").as("bounded"),
        sort_array(collect_list("v")).as("unbounded"),
        count(lit(1)).as("df"))
    assert(both.filter(col("df") >= 100).isEmpty) // precondition
    assert(both.filter(col("bounded") =!= col("unbounded")).isEmpty)
  }

  test("collect_bounded caps every over-bound buffer at exactly `bound` " +
    "elements and count(1) still reports the true df") {
    graft.functions.NativeFunctions.register(spark)
    val li = Tables.lineitem(spark, sf0001)
      .select(col("l_orderkey").as("k"),
        col("l_linenumber").cast("bigint").as("v"))
      .repartition(8)
    val r = li.groupBy("k")
      .agg(expr("collect_bounded(v, 2)").as("capped"),
        count(lit(1)).as("df"))
    // groups over the bound hold exactly `bound` ids; under it, all of them
    assert(r.filter(col("df") > 2 && size(col("capped")) =!= 2).isEmpty)
    assert(r.filter(col("df") <= 2 && size(col("capped")) =!= col("df"))
      .isEmpty)
    assert(r.filter(col("df") > 2).count() > 0) // the cap path actually ran
  }

  test("collect_bounded rejects non-bigint input at analysis time") {
    graft.functions.NativeFunctions.register(spark)
    val e = intercept[Exception] {
      spark.sql("SELECT collect_bounded(x, 10) FROM VALUES ('a') t(x)")
        .collect()
    }
    assert(e.getMessage.toLowerCase.contains("bigint"))
  }

  test("GraftExtensions installs array_dot via SparkSessionExtensions") {
    // Force a genuinely new SparkSession (same SparkContext) so the
    // builder applies the extension instead of returning the fixture
    // session; restore the fixture session afterwards.
    val before = spark
    SparkSession.clearActiveSession()
    SparkSession.clearDefaultSession()
    try {
      val s2 = SparkSession.builder()
        .master("local[2]")
        .withExtensions(new graft.functions.GraftExtensions)
        .getOrCreate()
      assert(s2 ne before)
      val ok = s2.sql("SELECT array_dot(array(1.0d, 3.0d), array(2.0d, 4.0d))")
        .collect().head.getDouble(0)
      assert(ok == 14.0)
      val capped = s2.sql(
        "SELECT collect_bounded(v, 2) FROM VALUES (1L), (2L), (3L) t(v)")
        .collect().head.getSeq[Long](0)
      assert(capped.length == 2)
      // the builder path must also install the as-of planner strategy:
      // plan a raw AsOfJoinPlan WITHOUT AsOf.register's runtime hook —
      // with no strategy the planner cannot lower the node and throws
      val probe = s2.sql("SELECT * FROM VALUES (1L, 5L) p(k, t)")
      val build = s2.sql("SELECT * FROM VALUES (1L, 3L, 9L) b(bk, bt, v)")
      def a(df: org.apache.spark.sql.DataFrame, n: String) =
        df.queryExecution.analyzed.output.find(_.name == n).get
      val asof = org.apache.spark.sql.graft.PlanBridge.ofRows(s2,
        plans.AsOfJoinPlan(
          probe.queryExecution.analyzed, build.queryExecution.analyzed,
          a(probe, "k"), a(build, "bk"), a(probe, "t"), a(build, "bt"),
          Seq.empty))
      val row = asof.collect().head
      assert(row.getLong(4) == 9L, "as-of should match the t=3 build row")
    } finally {
      SparkSession.setDefaultSession(before)
      SparkSession.setActiveSession(before)
    }
  }
}
