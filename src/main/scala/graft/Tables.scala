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
  /** events.ts is parquet TIMESTAMP(NANOS), which Spark 4.x rejects by
    * default. Read it as a long (legacy conf) and truncate ns→µs with
    * integer division — the same truncation DuckDB applies when it reads
    * the file as µs TIMESTAMP, so both engines see identical values
    * (verified on rows with ns remainder ≥ 500: both floor). */
  def events(s: SparkSession, d: String): DataFrame = {
    s.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    table(s, d, "events").withColumn("ts",
      org.apache.spark.sql.functions.timestamp_micros(
        org.apache.spark.sql.functions.expr("ts div 1000")))
  }
  def documents(s: SparkSession, d: String): DataFrame = table(s, d, "documents")
  def embeddings(s: SparkSession, d: String): DataFrame =
    table(s, d, "embeddings")
}
