package graft
import org.apache.spark.sql.{SparkSession, DataFrame}

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  *
  * `queries` / `oracleSql` are aggregated from the per-area modules; each
  * SURVEY §2 key appears in exactly one module. Keys, once declared, are
  * stable forever (SURVEY §7.4.8).
  */
object SparkEntry {
  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0. */
  def entry(spark: SparkSession): DataFrame =
    relational.Aggregates.qAggHash(spark, "/root/testdata/sf0.001")

  private val modules: Seq[(Map[String, Q], Map[String, String])] = Seq(
    (relational.Aggregates.queries, relational.Aggregates.oracle)
  )

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] =
    modules.iterator.flatMap(_._1).toMap

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omit for non-SQL-expressible ops. */
  def oracleSql: Map[String, String] =
    modules.iterator.flatMap(_._2).toMap
}
