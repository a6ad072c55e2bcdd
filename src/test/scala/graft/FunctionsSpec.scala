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
    } finally {
      SparkSession.setDefaultSession(before)
      SparkSession.setActiveSession(before)
    }
  }
}
