package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Loaders for the harness parquet tables (TESTDATA.md / FIXTURES.md).
  *
  * All tables live as single parquet files under an sf-dir
  * (`/root/testdata/sf{0.001,0.01,0.1}`). Schemas are carried by parquet;
  * we read schema-on-storage (SURVEY §1.3). At 100 TB these would be
  * partitioned directories — `spark.read.parquet` handles both shapes, so
  * every operator written against these loaders scales unchanged.
  */
object Tables {
  /** All harness table names. */
  val names: Seq[String] = Seq(
    "region", "nation", "customer", "supplier", "part", "orders",
    "lineitem", "events", "documents", "embeddings")

  def table(spark: SparkSession, sfDir: String, name: String): DataFrame =
    spark.read.parquet(s"$sfDir/$name.parquet")

  def region(s: SparkSession, d: String): DataFrame = table(s, d, "region")
  def nation(s: SparkSession, d: String): DataFrame = table(s, d, "nation")
  def customer(s: SparkSession, d: String): DataFrame = table(s, d, "customer")
  def supplier(s: SparkSession, d: String): DataFrame = table(s, d, "supplier")
  def part(s: SparkSession, d: String): DataFrame = table(s, d, "part")
  def orders(s: SparkSession, d: String): DataFrame = table(s, d, "orders")
  def lineitem(s: SparkSession, d: String): DataFrame = table(s, d, "lineitem")
  /** events.ts has drifted across fixture generations: older fixtures
    * store parquet TIMESTAMP(NANOS) (which Spark 4.x rejects unless read
    * as a long via the legacy conf), newer ones plain timestamp[us]
    * (loaded as TIMESTAMP_NTZ). Dispatch on the loaded dtype so both
    * shapes work: ns→µs integer truncation on the nanos path matches
    * DuckDB's floor; the µs path only normalizes NTZ→LTZ, which with the
    * UTC session timezone preserves every instant and keeps the
    * downstream column type identical across fixture generations. */
  def events(s: SparkSession, d: String): DataFrame = {
    import org.apache.spark.sql.functions.{col, expr, timestamp_micros}
    import org.apache.spark.sql.types.{LongType, TimestampNTZType, TimestampType}
    val df =
      try table(s, d, "events")
      catch {
        case _: org.apache.spark.sql.AnalysisException =>
          // TIMESTAMP(NANOS) fixture: only now enable the legacy long read.
          s.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
          table(s, d, "events")
      }
    df.schema("ts").dataType match {
      case LongType =>
        df.withColumn("ts", timestamp_micros(expr("ts div 1000")))
      case TimestampNTZType =>
        df.withColumn("ts", col("ts").cast(TimestampType))
      case _ => df
    }
  }
  def documents(s: SparkSession, d: String): DataFrame = table(s, d, "documents")
  def embeddings(s: SparkSession, d: String): DataFrame =
    table(s, d, "embeddings")
}
