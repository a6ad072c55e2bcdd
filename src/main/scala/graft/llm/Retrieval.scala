package graft.llm

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.{Q, Tables}

/** Retrieval-scoring operators (SURVEY §2.10 extension, round 7): BM25
  * ranking of the corpus against a fixed query — the lexical-retrieval
  * primitive a training pipeline uses for data selection ("find documents
  * like this benchmark/domain seed") and for RAG index sanity checks, and
  * the classical complement to the embedding-space q_sim_* family.
  *
  * Scale notes (100 TB posture):
  *  - The query side is O(terms) — tiny, fixed. Per-doc term frequencies
  *    come from ONE scan of the corpus with the term filter pushed into
  *    the explode (only matching tokens survive the flatMap), so the
  *    shuffled tf table is |matching docs × query terms|, not corpus-sized.
  *  - Corpus constants (N, avgdl) are a 1-row aggregate; per-term df is an
  *    O(terms)-row aggregate — both broadcast. Nothing corpus-sized joins
  *    or shuffles twice; the final top-k is a TakeOrdered (distributed
  *    partial top-k), not a global sort.
  *  - BM25 scores are sums of irrational terms (ln-idf × rational tf
  *    saturation), so the 1e-6 floor is ulp-safe (SURVEY §7.4.9) and the
  *    (score, doc_id) ordering is a cross-engine total order.
  */
object Retrieval {

  /** Fixed query for the harness corpus (high-df terms so every sf dir
    * returns a full candidate set; the operator's shape is term-agnostic). */
  private val terms = Seq("join", "vector", "scan")
  private val K1 = 1.2
  private val B = 0.75

  /** q_rank_bm25 — Okapi BM25 top-20:
    * idf(t) = ln(1 + (N − df + 0.5)/(df + 0.5)) (the +1 form, always
    * positive), tf saturation k1 = 1.2, length normalization b = 0.75. */
  def qRankBm25(s: SparkSession, dir: String): DataFrame = {
    val docs = Tables.documents(s, dir)
      .select(col("doc_id"), split(col("text"), " ").as("toks"))
      .select(col("doc_id"), size(col("toks")).as("dl"), col("toks"))
    val termLit = array(terms.map(lit): _*)
    // ONE corpus scan: keep only query-term tokens before exploding, then
    // pin the (matching docs × terms)-sized tf table with an eager
    // localCheckpoint — it feeds both the df aggregate and the final
    // scoring join, and without the checkpoint the corpus explode subtree
    // would be re-evaluated per consumer (the q_dedup_ngram round-5
    // regression pattern; Q cache-ownership contract allows checkpoint)
    val tf = docs
      .select(col("doc_id"), col("dl"),
        explode(array_intersect(col("toks"), termLit)).as("t"),
        col("toks"))
      .select(col("doc_id"), col("dl"), col("t"),
        size(expr("filter(toks, x -> x = t)")).as("tf"))
      .localCheckpoint(true)
    val corpus = docs.agg(count(lit(1)).as("n_docs"),
      avg("dl").as("avgdl"))
    val df = tf.groupBy("t").agg(count(lit(1)).as("df"))
    tf.join(broadcast(df), "t")
      .crossJoin(broadcast(corpus))
      .withColumn("idf",
        log(lit(1.0) + (col("n_docs") - col("df") + 0.5) / (col("df") + 0.5)))
      .withColumn("w",
        col("idf") * col("tf") * (K1 + 1) /
          (col("tf") + lit(K1) * (lit(1 - B) + lit(B) * col("dl") / col("avgdl"))))
      .groupBy("doc_id")
      .agg((floor(sum("w") * lit(1e6)) / lit(1e6)).as("score"),
        count(lit(1)).as("n_terms"))
      .orderBy(desc("score"), col("doc_id"))
      .limit(20)
  }

  val queries: Map[String, Q] = Map(
    "q_rank_bm25" -> (qRankBm25 _))

  val oracle: Map[String, String] = Map(
    "q_rank_bm25" ->
      """WITH d AS (
        |  SELECT doc_id, string_split(text, ' ') AS toks,
        |    len(string_split(text, ' ')) AS dl
        |  FROM documents),
        |tf AS (
        |  SELECT doc_id, dl, t,
        |    len(list_filter(toks, x -> x = t)) AS tf
        |  FROM (SELECT doc_id, dl, toks,
        |          unnest(list_intersect(toks, ['join', 'vector', 'scan']))
        |            AS t
        |        FROM d)),
        |corpus AS (SELECT COUNT(*) AS n_docs, AVG(dl) AS avgdl FROM d),
        |df AS (SELECT t, COUNT(*) AS df FROM tf GROUP BY t),
        |w AS (
        |  SELECT doc_id,
        |    ln(1.0 + (n_docs - df.df + 0.5) / (df.df + 0.5))
        |      * tf * 2.2 / (tf + 1.2 * (1 - 0.75 + 0.75 * dl / avgdl)) AS w
        |  FROM tf JOIN df USING (t), corpus)
        |SELECT doc_id, FLOOR(SUM(w) * 1e6) / 1e6 AS score,
        |  COUNT(*) AS n_terms
        |FROM w GROUP BY doc_id
        |ORDER BY score DESC, doc_id
        |LIMIT 20""".stripMargin)
}
