package graft
import org.apache.spark.sql.{SparkSession, DataFrame}

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  *
  * `queries` / `oracleSql` are aggregated from the per-area modules; each
  * SURVEY §2 key appears in exactly one module (asserted below). Keys, once
  * declared, are stable forever (SURVEY §7.4.8).
  */
object SparkEntry {
  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0. */
  def entry(spark: SparkSession): DataFrame =
    relational.Aggregates.qAggHash(spark, "/root/testdata/sf0.001")

  private val modules: Seq[(Map[String, Q], Map[String, String])] = Seq(
    (relational.Core.queries, relational.Core.oracle),
    (relational.Joins.queries, relational.Joins.oracle),
    (relational.Aggregates.queries, relational.Aggregates.oracle),
    (relational.Windows.queries, relational.Windows.oracle),
    (relational.Scalars.queries, relational.Scalars.oracle),
    (relational.ScaleOps.queries, relational.ScaleOps.oracle),
    (relational.Stats.queries, relational.Stats.oracle),
    (relational.Extended.queries, relational.Extended.oracle),
    (relational.TimeSeries.queries, relational.TimeSeries.oracle),
    (sources.Sources.queries, sources.Sources.oracle),
    (sources.Layout.queries, sources.Layout.oracle),
    (sources.TxTable.queries, sources.TxTable.oracle),
    (text.TextOps.queries, text.TextOps.oracle),
    (text.Analysis.queries, text.Analysis.oracle),
    (llm.Dedup.queries, llm.Dedup.oracle),
    (llm.DedupVariants.queries, llm.DedupVariants.oracle),
    (llm.Curation.queries, llm.Curation.oracle),
    (llm.Governance.queries, llm.Governance.oracle),
    (llm.Retrieval.queries, llm.Retrieval.oracle),
    (multimodal.Multimodal.queries, multimodal.Multimodal.oracle),
    (llm.Similarity.queries, llm.Similarity.oracle),
    (ml.Pipelines.queries, ml.Pipelines.oracle),
    (stream.EventOps.queries, stream.EventOps.oracle),
    (udf.Extensions.queries, udf.Extensions.oracle))

  private def merged[V](ms: Seq[Map[String, V]]): Map[String, V] = {
    val out = ms.iterator.flatten.toMap
    require(out.size == ms.map(_.size).sum,
      "duplicate query key across modules")
    out
  }

  /** One entry per implemented operator from SURVEY.md §2. */
  val queries: Map[String, (SparkSession, String) => DataFrame] =
    merged(modules.map(_._1))

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omitted for non-SQL-expressible ops. */
  val oracleSql: Map[String, String] = {
    val out = merged(modules.map(_._2))
    require(out.keySet.subsetOf(queries.keySet),
      "oracleSql key without a queries entry")
    out
  }
}
