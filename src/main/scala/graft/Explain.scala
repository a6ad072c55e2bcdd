package graft
import org.apache.spark.sql.SparkSession

/** Plan-audit main: prints the formatted physical plan for the given query
  * keys (default: a representative headline set) so scan pruning, pushed
  * filters, join strategies, and codegen spans can be reviewed.
  * Usage: runMain graft.Explain <sfDir> [key ...] */
object Explain {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.001")
    val keys = if (args.length > 1) args.drop(1).toSeq else Seq(
      "q_agg_hash", "q_join_broadcast", "q_join_inner", "q_filter_pred",
      "q_topk_per_group", "q_limit_topk", "q_dedup_exact", "q_sim_topk",
      "q_text_tfidf", "q_stream_tumbling",
      "q_agg_salted", "q_join_skew_salted", "q_join_bucketed",
      "q_scan_partitioned", "q_stream_join")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    keys.foreach { k =>
      println(s"\n========== $k ==========")
      SparkEntry.queries(k)(spark, sfDir).explain("formatted")
    }
    spark.stop()
  }
}
