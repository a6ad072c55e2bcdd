package graft.llm

import org.apache.spark.ml.feature.BucketedRandomProjectionLSH
import org.apache.spark.ml.functions.array_to_vector
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.{Q, Tables}

/** Similarity search over the embedding column (SURVEY §2.10).
  *
  * Scale notes (100 TB posture): q_sim_topk is the exact baseline — the
  * bounded query set is broadcast against the distributed candidate side
  * (never a shuffled N×N cross join), then per-query top-k via window
  * rank. Cost is O(|queries| · n); it exists to calibrate the approximate
  * path. q_sim_lsh is the at-scale variant: random-projection bucketing
  * turns the quadratic pair space into per-bucket joins; recall vs the
  * exact baseline is asserted in tests (≥ 0.8). Norms are computed once
  * per side before the join, not per pair.
  */
object Similarity {

  /** Per-element double cast (embeddings are float32; both engines compute
    * in float64 after this, so sums agree to well under the 6dp grid). */
  private def asDouble(c: Column): Column =
    transform(c, x => x.cast("double"))

  private def l2norm(c: Column): Column =
    sqrt(aggregate(transform(c, x => x * x), lit(0.0), (a, x) => a + x))

  /** Codegen'd dot product (graft.functions.ArrayDotProduct) — same
    * left-to-right accumulation as the interpreted higher-order form, so
    * results are bit-identical, but it runs inside whole-stage codegen:
    * the per-pair hot loop of every similarity operator. */
  private def dot(a: Column, b: Column): Column =
    call_function("array_dot", a, b)

  /** Exact cosine top-k of the first `nQueries` vectors against the whole
    * embedding table; k+tie-broken by neighbor id on the 6dp-rounded score. */
  private def cosineTopK(s: SparkSession, dir: String, nQueries: Int, k: Int)
      : DataFrame = {
    graft.functions.NativeFunctions.register(s)
    val e = Tables.embeddings(s, dir)
      .select(col("vec_id"), asDouble(col("embedding")).as("emb"))
      .withColumn("nrm", l2norm(col("emb")))
    val q = e.filter(col("vec_id") < nQueries)
      .select(col("vec_id").as("qid"), col("emb").as("qemb"),
        col("nrm").as("qnrm"))
    val pairs = e.join(broadcast(q), col("vec_id") =!= col("qid"))
      .select(col("qid"), col("vec_id").as("cid"),
        round(dot(col("qemb"), col("emb")) / (col("qnrm") * col("nrm")), 6)
          .as("cos_sim"))
    val w = Window.partitionBy("qid")
      .orderBy(col("cos_sim").desc, col("cid").asc)
    pairs.withColumn("rn", row_number().over(w)).filter(col("rn") <= k)
  }

  /** q_sim_topk — brute-force cosine top-5 per query vector. */
  def qSimTopk(s: SparkSession, dir: String): DataFrame =
    cosineTopK(s, dir, nQueries = 20, k = 5)
      .select("qid", "cid", "rn", "cos_sim")
      .orderBy("qid", "rn")

  /** q_sim_lsh — approximate neighbors via random-projection LSH: the
    * 100 TB path for q_sim_topk. Euclidean-distance based; pinned seed and
    * bucket length. No oracle (bucketing is engine-specific); tests assert
    * recall ≥ 0.8 against the exact baseline. */
  def qSimLsh(s: SparkSession, dir: String): DataFrame = {
    val e = Tables.embeddings(s, dir)
      .select(col("vec_id"),
        array_to_vector(asDouble(col("embedding"))).as("features"))
    val q = e.filter(col("vec_id") < 20)
      .select(col("vec_id").as("qid"), col("features").as("qf"))
    val lsh = new BucketedRandomProjectionLSH()
      .setInputCol("features").setOutputCol("hashes")
      .setBucketLength(1.0).setNumHashTables(4).setSeed(42L)
    val model = lsh.fit(e)
    val joined = model.approxSimilarityJoin(
      q.withColumnRenamed("qf", "features"), e, 3.0, "dist")
      .select(col("datasetA.qid").as("qid"),
        col("datasetB.vec_id").as("cid"),
        round(col("dist"), 6).as("dist"))
      .filter(col("qid") =!= col("cid"))
    val w = Window.partitionBy("qid").orderBy(col("dist").asc, col("cid").asc)
    joined.withColumn("rn", row_number().over(w)).filter(col("rn") <= 5)
      .orderBy("qid", "rn")
  }

  /** q_sim_ivf — IVF (inverted-file) approximate neighbors: a seeded
    * KMeans coarse quantizer (k=16) buckets all vectors; each query
    * probes its nprobe=4 nearest centroids and brute-forces cosine only
    * within those buckets. This is the classic at-scale ANN layout: the
    * candidate set shrinks to ~nprobe/k of the corpus, centroids are
    * broadcast, and the final filter is exactly the q_dedup_embed /
    * q_sim_topk cosine. No oracle (bucketing is model-dependent);
    * scalatest asserts recall vs the exact baseline. */
  def qSimIvf(s: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.ml.clustering.KMeans
    graft.functions.NativeFunctions.register(s)
    val e = Tables.embeddings(s, dir)
      .select(col("vec_id"), asDouble(col("embedding")).as("emb"))
      .withColumn("nrm", l2norm(col("emb")))
    val feat = e.withColumn("features", array_to_vector(col("emb")))
    val km = new KMeans().setK(16).setSeed(42L).setFeaturesCol("features")
      .setPredictionCol("bucket")
    val model = km.fit(feat)
    val bucketed = model.transform(feat)
      .select(col("vec_id"), col("emb"), col("nrm"), col("bucket"))
    val centroids = model.clusterCenters.zipWithIndex.map { case (c, i) =>
      (i, c.toArray)
    }.toSeq
    val cents = s.createDataFrame(centroids).toDF("bucket", "cemb")
    // nprobe=4 nearest centroids per query (euclidean), centroids broadcast
    val q = bucketed.filter(col("vec_id") < 20)
      .select(col("vec_id").as("qid"), col("emb").as("qemb"),
        col("nrm").as("qnrm"))
    val qBuckets = q.crossJoin(broadcast(cents))
      .withColumn("d2", aggregate(
        zip_with(col("qemb"), col("cemb"), (x, y) => (x - y) * (x - y)),
        lit(0.0), (a, x) => a + x))
      .withColumn("rn", row_number().over(
        Window.partitionBy("qid").orderBy(col("d2").asc, col("bucket").asc)))
      .filter(col("rn") <= 4)
      .select("qid", "qemb", "qnrm", "bucket")
    val pairs = qBuckets.join(bucketed, Seq("bucket"))
      .filter(col("vec_id") =!= col("qid"))
      .select(col("qid"), col("vec_id").as("cid"),
        round(dot(col("qemb"), col("emb")) / (col("qnrm") * col("nrm")), 6)
          .as("cos_sim"))
    val w = Window.partitionBy("qid")
      .orderBy(col("cos_sim").desc, col("cid").asc)
    pairs.withColumn("rn", row_number().over(w)).filter(col("rn") <= 5)
      .select("qid", "cid", "rn", "cos_sim")
      .orderBy("qid", "rn")
  }

  /** q_sim_pq — product-quantization ANN with asymmetric-distance
    * computation (round 11): the vector-STORAGE scale path beyond IVF's
    * candidate pruning. Vectors are L2-normalized (so L2 ordering ==
    * cosine ordering), split into 16 subspaces × 4 dims, and each
    * subspace gets a seeded KMeans-16 codebook: every vector compresses
    * to 16 codes of 4 bits — 64 float32 dims → 8 B packed, a 32×
    * shrink, which at 100 TB is the difference between the index fitting
    * in executor memory and every probe being an IO scan of raw vectors.
    * (4-dim subspaces rather than 8: same bits, double the codebook
    * resolution — the 8-dim geometry measured only 0.79 recall@5 here.)
    * Queries build an ADC lookup table (per subspace, squared distance
    * from the query subvector to each of its 16 centroids — 256 doubles
    * per query, broadcast); a candidate's approximate distance is then
    * 16 table lookups + adds over its codes, never a read of the raw
    * vector. The ADC top-50 shortlist is re-ranked with true cosine, so
    * emitted scores are exact over a PQ-recalled candidate set.
    * ApproxSpec asserts recall ≥ 0.9 vs the exact q_sim_topk; no oracle
    * (codebooks are trained model state, engine-specific by design).
    * Composes with qSimIvf at scale: IVF prunes candidates, PQ shrinks
    * what remains. */
  def qSimPq(s: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.ml.clustering.KMeans
    graft.functions.NativeFunctions.register(s)
    val nSub = 16; val dSub = 4; val nCent = 16
    val e = Tables.embeddings(s, dir)
      .select(col("vec_id"), asDouble(col("embedding")).as("emb"))
      .withColumn("nrm", l2norm(col("emb")))
      .filter(col("nrm") > 0)
      .select(col("vec_id"),
        transform(col("emb"), x => x / col("nrm")).as("unit"))
      // eager checkpoint: 8 codebook fits + encode + query build all
      // re-read this narrow projection (cache-ownership contract)
      .localCheckpoint(true)
    // one seeded KMeans per subspace — model fits are driver-coordinated
    // like every q_ml_* key; 16×4 doubles per codebook ride to the
    // executors as plan literals (broadcast-by-construction). The 16
    // fits are independent, so they run CONCURRENTLY (each fit is a
    // handful of tiny jobs whose fixed scheduling overhead, not compute,
    // dominates — sequential fits measured 16 s at sf0.1, concurrent
    // ~4 s); random init instead of the k-means|| default drops the
    // multi-pass init jobs, and each fit stays seed-deterministic.
    import scala.concurrent.{Await, Future}
    import scala.concurrent.ExecutionContext.Implicits.global
    import scala.concurrent.duration.Duration
    val codebooks: Seq[Seq[Seq[Double]]] = Await.result(
      Future.sequence((0 until nSub).map { i => Future {
        val feat = e.select(array_to_vector(
          slice(col("unit"), i * dSub + 1, dSub)).as("features"))
        new KMeans().setK(nCent).setSeed(42L + i).setMaxIter(10)
          .setInitMode("random")
          .setFeaturesCol("features").setPredictionCol("c")
          .fit(feat).clusterCenters.toSeq.map(_.toArray.toSeq)
      }}), Duration.Inf)
    def centsLit(i: Int): Column =
      array(codebooks(i).map(c => array(c.map(lit): _*)): _*)
    def d2(cent: Column, sub: Column): Column =
      aggregate(zip_with(cent, sub, (x, y) => (x - y) * (x - y)),
        lit(0.0), (a, x) => a + x)
    def subvec(c: Column, i: Int): Column = slice(c, i * dSub + 1, dSub)
    // encode: one 4-bit code per subspace (argmin centroid;
    // array_position takes the FIRST minimum — deterministic under ties)
    val codes = (0 until nSub).map { i =>
      val dists = transform(centsLit(i),
        cent => d2(cent, subvec(col("unit"), i)))
      (array_position(dists, array_min(dists)) - 1).cast("int")
    }
    val enc = e.select(col("vec_id"), array(codes: _*).as("codes"))
    // ADC lookup table: lut[i*16 + c] = ||q_sub_i - cent_{i,c}||²
    val lut = concat((0 until nSub).map { i =>
      transform(centsLit(i), cent => d2(cent, subvec(col("unit"), i)))
    }: _*)
    val q = e.filter(col("vec_id") < 20)
      .select(col("vec_id").as("qid"), col("unit").as("qunit"),
        lut.as("lut"))
    val adc = enc.join(broadcast(q), col("vec_id") =!= col("qid"))
      .withColumn("adc", expr(
        s"""aggregate(transform(codes,
           |  (c, i) -> element_at(lut, i * $nCent + c + 1)),
           |  cast(0 as double), (a, x) -> a + x)""".stripMargin))
    val wAdc = Window.partitionBy("qid")
      .orderBy(col("adc").asc, col("vec_id").asc)
    val shortlist = adc.withColumn("rs", row_number().over(wAdc))
      .filter(col("rs") <= 50)
      .select("qid", "vec_id")
    // exact re-rank: true cosine = dot of unit vectors, codegen'd
    val rer = shortlist
      .join(e, Seq("vec_id"))
      .join(broadcast(q.select("qid", "qunit")), Seq("qid"))
      .select(col("qid"), col("vec_id").as("cid"),
        round(dot(col("qunit"), col("unit")), 6).as("cos_sim"))
    val w = Window.partitionBy("qid")
      .orderBy(col("cos_sim").desc, col("cid").asc)
    rer.withColumn("rn", row_number().over(w)).filter(col("rn") <= 5)
      .select("qid", "cid", "rn", "cos_sim")
      .orderBy("qid", "rn")
  }

  /** q_knn_classify — majority label among the 5 cosine-nearest neighbors
    * (tie → smallest label). Stacks on the exact top-k operator. */
  def qKnnClassify(s: SparkSession, dir: String): DataFrame = {
    val labels = Tables.embeddings(s, dir)
      .select(col("vec_id").as("cid"), col("label"))
    val votes = cosineTopK(s, dir, nQueries = 20, k = 5)
      .join(broadcast(labels), Seq("cid"))
      .groupBy("qid", "label").agg(count(lit(1)).as("votes"))
    val w = Window.partitionBy("qid")
      .orderBy(col("votes").desc, col("label").asc)
    votes.withColumn("rn", row_number().over(w)).filter(col("rn") === 1)
      .select(col("qid"), col("label").as("pred_label"), col("votes"))
      .orderBy("qid")
  }

  /** q_embed_stats — per-label vector-column statistics: mean L2 norm and
    * dimension-wise means of the first 4 dims. */
  def qEmbedStats(s: SparkSession, dir: String): DataFrame =
    Tables.embeddings(s, dir)
      .select(col("label"), asDouble(col("embedding")).as("emb"))
      .select(col("label"), l2norm(col("emb")).as("nrm"),
        element_at(col("emb"), 1).as("d1"),
        element_at(col("emb"), 2).as("d2"),
        element_at(col("emb"), 3).as("d3"),
        element_at(col("emb"), 4).as("d4"))
      .groupBy("label")
      .agg(count(lit(1)).as("n_vecs"),
        round(avg("nrm"), 6).as("avg_norm"),
        round(avg("d1"), 6).as("avg_d1"),
        round(avg("d2"), 6).as("avg_d2"),
        round(avg("d3"), 6).as("avg_d3"),
        round(avg("d4"), 6).as("avg_d4"))
      .orderBy("label")

  /** q_embed_outliers — embedding-hygiene scrub (round 7): flag vectors
    * whose L2 norm is a corpus-level outlier (|z| > 2) or degenerate
    * (zero norm) — the sanity filter an ANN/dedup pipeline runs before
    * indexing, since a handful of broken embeddings (failed encoder
    * batches, zero pads) poison every cosine neighborhood they touch.
    * Scale shape: per-row norm (codegen-friendly projection), a 1-row
    * moments aggregate broadcast back, and a scan-side filter — the
    * q_anomaly_zscore pattern on the vector table; nothing shuffles but
    * the 1-row stats. Norm and z are irrational (sqrt), so the 1e-6
    * floor is ulp-safe (SURVEY §7.4.9). */
  def qEmbedOutliers(s: SparkSession, dir: String): DataFrame = {
    val v = Tables.embeddings(s, dir)
      .select(col("vec_id"), col("label"),
        l2norm(asDouble(col("embedding"))).as("nrm"))
    val st = v.agg(avg("nrm").as("mu"), stddev_samp("nrm").as("sd"))
    v.crossJoin(broadcast(st))
      .withColumn("z", (col("nrm") - col("mu")) / col("sd"))
      .filter(abs(col("z")) > 2.0 || col("nrm") === 0.0)
      .select(col("vec_id"), col("label"),
        (floor(col("nrm") * lit(1e6)) / lit(1e6)).as("nrm"),
        (floor(col("z") * lit(1e6)) / lit(1e6)).as("z"))
      .orderBy("vec_id")
  }

  val queries: Map[String, Q] = Map(
    "q_embed_outliers" -> (qEmbedOutliers _),
    "q_sim_topk" -> (qSimTopk _),
    "q_sim_lsh" -> (qSimLsh _),
    "q_sim_ivf" -> (qSimIvf _),
    "q_sim_pq" -> (qSimPq _),
    "q_knn_classify" -> (qKnnClassify _),
    "q_embed_stats" -> (qEmbedStats _))

  val oracle: Map[String, String] = Map(
    "q_embed_outliers" ->
      """WITH v AS (
        |  SELECT vec_id, label,
        |    sqrt(list_sum(list_transform(embedding::DOUBLE[],
        |      x -> x * x))) AS nrm
        |  FROM embeddings),
        |st AS (SELECT AVG(nrm) AS mu, stddev_samp(nrm) AS sd FROM v)
        |SELECT vec_id, label,
        |  FLOOR(nrm * 1e6) / 1e6 AS nrm,
        |  FLOOR((nrm - mu) / sd * 1e6) / 1e6 AS z
        |FROM v, st
        |WHERE abs((nrm - mu) / sd) > 2.0 OR nrm = 0.0
        |ORDER BY vec_id""".stripMargin,
    "q_sim_topk" ->
      """WITH e AS (
        |  SELECT vec_id, embedding::DOUBLE[] AS emb FROM embeddings),
        |q AS (SELECT * FROM e WHERE vec_id < 20),
        |pairs AS (
        |  SELECT q.vec_id AS qid, c.vec_id AS cid,
        |    ROUND(list_cosine_similarity(q.emb, c.emb), 6) AS cos_sim
        |  FROM q JOIN e c ON q.vec_id <> c.vec_id)
        |SELECT qid, cid,
        |  row_number() OVER (PARTITION BY qid
        |    ORDER BY cos_sim DESC, cid ASC) AS rn,
        |  cos_sim
        |FROM pairs
        |QUALIFY rn <= 5
        |ORDER BY qid, rn""".stripMargin,
    "q_knn_classify" ->
      """WITH e AS (
        |  SELECT vec_id, label, embedding::DOUBLE[] AS emb FROM embeddings),
        |q AS (SELECT * FROM e WHERE vec_id < 20),
        |pairs AS (
        |  SELECT q.vec_id AS qid, c.vec_id AS cid, c.label,
        |    ROUND(list_cosine_similarity(q.emb, c.emb), 6) AS cos_sim
        |  FROM q JOIN e c ON q.vec_id <> c.vec_id),
        |top5 AS (
        |  SELECT qid, cid, label,
        |    row_number() OVER (PARTITION BY qid
        |      ORDER BY cos_sim DESC, cid ASC) AS rn
        |  FROM pairs QUALIFY rn <= 5),
        |votes AS (
        |  SELECT qid, label, COUNT(*) AS votes
        |  FROM top5 GROUP BY qid, label)
        |SELECT qid, label AS pred_label, votes
        |FROM (SELECT *, row_number() OVER (PARTITION BY qid
        |        ORDER BY votes DESC, label ASC) AS rn FROM votes)
        |WHERE rn = 1
        |ORDER BY qid""".stripMargin,
    "q_embed_stats" ->
      """WITH e AS (
        |  SELECT label, embedding::DOUBLE[] AS emb FROM embeddings),
        |per_vec AS (
        |  SELECT label,
        |    sqrt(list_sum(list_transform(emb, x -> x * x))) AS nrm,
        |    emb[1] AS d1, emb[2] AS d2, emb[3] AS d3, emb[4] AS d4
        |  FROM e)
        |SELECT label, COUNT(*) AS n_vecs,
        |  ROUND(AVG(nrm), 6) AS avg_norm,
        |  ROUND(AVG(d1), 6) AS avg_d1,
        |  ROUND(AVG(d2), 6) AS avg_d2,
        |  ROUND(AVG(d3), 6) AS avg_d3,
        |  ROUND(AVG(d4), 6) AS avg_d4
        |FROM per_vec
        |GROUP BY label
        |ORDER BY label""".stripMargin)
}
