package graft

import java.sql.Timestamp
import org.apache.spark.sql.functions._
import org.scalacheck.Gen
import org.scalacheck.rng.Seed
import org.scalatest.funsuite.AnyFunSuite

/** Property-based invariants (SURVEY §5.3) over scalacheck-generated data:
  * operators must satisfy their algebraic laws for arbitrary inputs, not
  * just the harness tables. Generators are driven with fixed seeds (the
  * scalatest-scalacheck bridge artifact isn't in the offline cache), so
  * runs are deterministic; 5 samples per property, each materializing
  * real Spark jobs. */
class PropertySpec extends AnyFunSuite with SparkFixture {

  private def samples[A](g: Gen[A], n: Int = 5): Seq[A] =
    (1 to n).map { i =>
      g.apply(Gen.Parameters.default, Seed(i.toLong))
        .getOrElse(fail(s"generator produced no value for seed $i"))
    }

  private val docGen: Gen[List[(Long, String)]] = for {
    n <- Gen.choose(1, 25)
    texts <- Gen.listOfN(n, Gen.listOfN(8,
      Gen.oneOf("join", "scan", "hash", "sort", "merge", "row"))
      .map(_.mkString(" ")))
  } yield texts.zipWithIndex.map { case (t, i) => (i.toLong, t) }

  test("exact dedup is idempotent and partitions the corpus") {
    import spark.implicits._
    samples(docGen).foreach { docs =>
      val df = docs.toDF("doc_id", "text")
      val once = df.select(col("doc_id"), sha2(col("text"), 256).as("h"))
        .groupBy("h").agg(min("doc_id").as("keeper_id"),
          count(lit(1)).as("dup_count"))
      val rows = once.collect()
      // survivors' dup counts cover every input row exactly once
      assert(rows.map(_.getLong(2)).sum == docs.length)
      // dedup of the survivors is a no-op (idempotence)
      val survivors = rows.map(_.getLong(1)).toSet
      val again = df.filter(col("doc_id").isin(survivors.toSeq: _*))
        .select(sha2(col("text"), 256).as("h")).distinct().count()
      assert(again == rows.length)
    }
  }

  test("window ranks are dense, gapless, and bounded by partition size") {
    import spark.implicits._
    val rowsGen = for {
      n <- Gen.choose(1, 60)
      rows <- Gen.listOfN(n, for {
        k <- Gen.choose(1, 4); v <- Gen.choose(0, 20)
      } yield (k, v))
    } yield rows.zipWithIndex.map { case ((k, v), i) => (k, v, i.toLong) }
    samples(rowsGen).foreach { rows =>
      val df = rows.toDF("k", "v", "id")
      val w = org.apache.spark.sql.expressions.Window
        .partitionBy("k").orderBy(col("v"), col("id"))
      val rn = df.withColumn("rn", row_number().over(w)).collect()
      rn.groupBy(_.getInt(0)).foreach { case (_, part) =>
        val ranks = part.map(_.getInt(3)).sorted
        assert(ranks.toSeq == (1 to part.length))
      }
    }
  }

  test("sessionization: session count matches a sequential scan and " +
      "counts cover all events") {
    import spark.implicits._
    val gapMs = 30L * 60 * 1000
    val evGen = for {
      n <- Gen.choose(1, 40)
      evs <- Gen.listOfN(n, for {
        u <- Gen.choose(1L, 3L)
        offMin <- Gen.choose(0, 72 * 60) // minutes over 3 days
      } yield (u, offMin))
    } yield evs.zipWithIndex.map { case ((u, off), i) =>
      Ev(i.toLong, new Timestamp(1704067200000L + off * 60000L), u,
        "click", 1.0)
    }
    samples(evGen).foreach { evs =>
      val sessions = stream.EventOps.sessionTransform(evs.toDF())
        .collect()
        .map(r => (r.getLong(0), r.getTimestamp(2).getTime,
          r.getTimestamp(3).getTime, r.getLong(4)))
      val expected = evs.groupBy(_.user_id).map { case (u, es) =>
        val ts = es.map(_.ts.getTime).sorted
        val breaks = ts.zip(ts.drop(1)).count { case (a, b) => b - a > gapMs }
        u -> (breaks + 1)
      }
      val got = sessions.groupBy(_._1).map { case (u, ss) => u -> ss.length }
      assert(got == expected)
      assert(sessions.map(_._4).sum == evs.length)
      assert(sessions.forall(s => s._2 <= s._3))
    }
  }

  test("dedup clustering: labels are component minima and pair-consistent") {
    val clusters = llm.DedupVariants.qDedupCluster(spark, sf0001)
      .select("doc_id", "cluster_id").collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    val pairs = llm.DedupVariants.qDedupNgram(spark, sf0001)
      .select("id_a", "id_b").collect()
      .map(r => (r.getLong(0), r.getLong(1)))
    assert(pairs.nonEmpty, "fixture corpus must contain near-dup pairs")
    // every paired doc is clustered, pairs share a label, and the label
    // is a member doc_id that is <= every member (the component min)
    pairs.foreach { case (a, b) =>
      assert(clusters.contains(a) && clusters.contains(b))
      assert(clusters(a) == clusters(b))
    }
    clusters.foreach { case (doc, label) =>
      assert(label <= doc && clusters(label) == label,
        s"label $label of doc $doc must be its component's min member")
    }
  }

  test("bloom+residual manifest probe equals the plain anti-join for " +
      "arbitrary manifest/crawl splits") {
    import spark.implicits._
    // the law manifestAntiJoin must satisfy regardless of bloom false
    // positives (cleared by the residual join) or capacity (sized from
    // the manifest itself): result == crawl ⟕̸ manifest. Overlapping and
    // disjoint key sets both generated; empty manifests degenerate to
    // identity.
    val gen = for {
      nm <- Gen.choose(0, 20)
      nc <- Gen.choose(1, 25)
      manifest <- Gen.listOfN(nm, Gen.choose(0, 30))
      crawl <- Gen.listOfN(nc, Gen.choose(0, 30))
    } yield (manifest.map(k => s"k$k").distinct,
      crawl.zipWithIndex.map { case (k, i) => (i.toLong, s"k$k") })
    samples(gen).foreach { case (manifest, crawl) =>
      val mdf = manifest.toDF("prefix_md5")
      val cdf = crawl.toDF("doc_id", "prefix_md5")
      val got = llm.DedupVariants.manifestAntiJoin(spark, cdf, mdf)
        .select("doc_id").collect().map(_.getLong(0)).sorted
      val expected = cdf.join(mdf, Seq("prefix_md5"), "left_anti")
        .select("doc_id").collect().map(_.getLong(0)).sorted
      assert(got.sameElements(expected),
        s"bloom probe diverged from plain anti-join: " +
          s"got ${got.toSeq}, expected ${expected.toSeq}")
    }
  }

  test("dedup clustering converges in the minimal round budget") {
    // near-dup clusters are tiny and dense (diameter ≤ 2 on the harness
    // corpus): min-label propagation must finish in ≤ 2 changing rounds
    // + 1 no-change confirmation. Each extra round is an O(|edges|)
    // keyed shuffle at 100 TB, so a regression in the edge construction
    // or convergence test should fail HERE, not surface as bench wobble
    // (round-10 brief item 5: rounds already minimal → assert, don't
    // re-engineer to large-star/small-star).
    val (labels, rounds) = llm.DedupVariants.clusterLabels(spark, sf0001)
    info(s"propagation rounds: $rounds")
    assert(labels.count() > 0)
    assert(rounds <= 3,
      s"label propagation took $rounds rounds — expected ≤ 3 " +
        "(diameter-2 clusters + confirmation)")
  }

  test("set algebra: |A ∪ B| = |A ∩ B| + |A \\ B| + |B \\ A| on keys") {
    import spark.implicits._
    val setsGen = for {
      a <- Gen.listOf(Gen.choose(0, 30))
      b <- Gen.listOf(Gen.choose(0, 30))
    } yield (a, b)
    samples(setsGen).foreach { case (a, b) =>
      val da = a.toDF("k").distinct()
      val db = b.toDF("k").distinct()
      val union = da.union(db).distinct().count()
      val inter = da.intersect(db).count()
      val aOnly = da.except(db).count()
      val bOnly = db.except(da).count()
      assert(union == inter + aOnly + bOnly)
    }
  }

  test("native as-of join (both directions) == brute force on arbitrary " +
      "key/time data, including ties, empty sides, and unmatched keys") {
    import spark.implicits._
    // few keys + tiny time domain → dense tie/boundary coverage; ids are
    // unique (tie-break determinism needs a total order, like real data)
    val sideGen: Gen[List[(Long, Long)]] = for {
      n <- Gen.choose(0, 40)
      rows <- Gen.listOfN(n, for {
        k <- Gen.choose(0L, 4L)
        t <- Gen.choose(0L, 9L)
      } yield (k, t))
    } yield rows
    val bothGen = for { p <- sideGen; b <- sideGen } yield (p, b)
    samples(bothGen, n = 8).foreach { case (probe, build) =>
      val p = probe.zipWithIndex
        .map { case ((k, t), i) => (i.toLong, k, t) }
        .toDF("probe_id", "k", "t")
      val b = build.zipWithIndex
        .map { case ((k, t), i) => (1000L + i, k, t) }
        .toDF("m_id", "b_k", "b_t")
      for (forward <- Seq(false, true)) {
        val got = plans.AsOf.asof(p, b, "k", "b_k", "t", "b_t",
          Seq("m_id"), forward).collect()
          .map(r => r.getLong(0) ->
            (if (r.isNullAt(3)) None else Some(r.getLong(3)))).toMap
        val expected = probe.zipWithIndex.map { case ((k, t), i) =>
          val cand = build.zipWithIndex.filter { case ((bk, bt), _) =>
            bk == k && (if (forward) bt >= t else bt <= t) }
          val pick =
            if (cand.isEmpty) None
            else if (forward) // min (time, id)
              Some(1000L + cand.minBy { case ((_, bt), j) => (bt, j) }._2)
            else // max (time, id)
              Some(1000L + cand.maxBy { case ((_, bt), j) => (bt, j) }._2)
          i.toLong -> pick
        }.toMap
        assert(got == expected,
          s"forward=$forward probe=$probe build=$build")
      }
    }
  }

  test("q_recursive_cte labels every clustered doc identically to " +
      "q_dedup_cluster's iterative min-label loop") {
    val iter = llm.DedupVariants.qDedupCluster(spark, sf0001).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    val rec = llm.DedupVariants.qRecursiveCte(spark, sf0001).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    assert(rec == iter,
      s"recursive-CTE closure disagrees with min-label loop: " +
        s"only-rec=${(rec -- iter).take(3)} only-iter=${(iter -- rec).take(3)}")
    assert(rec.nonEmpty)
  }

  test("BPE merge training is deterministic, lossless on the vocab, and " +
      "strictly compresses it") {
    import org.apache.spark.sql.functions._
    val t1 = text.Analysis.qTextBpe(spark, sf0001).collect()
      .map(r => (r.getInt(0), r.getString(1), r.getString(2),
        r.getString(3), r.getLong(4)))
    // exactly N ranked merges, each merged symbol the pair's concat,
    // each with positive weighted frequency
    assert(t1.map(_._1).toSeq == (1 to 50))
    assert(t1.forall { case (_, l, r, m, w) => m == l + r && w > 0 })
    // determinism: a second full training run learns the same table
    val t2 = text.Analysis.qTextBpe(spark, sf0001).collect()
      .map(r => (r.getInt(0), r.getString(1), r.getString(2),
        r.getString(3), r.getLong(4)))
    assert(t2.toSeq == t1.toSeq, "merge table differs across runs")
    // the final symbolization spells each word back exactly (merges
    // never lose or reorder characters) and strictly compresses the
    // weighted vocabulary (50 rounds must shrink total symbol count)
    val (_, vocab) = text.Analysis.bpeTrain(spark, sf0001, 50)
    val v = vocab.select(col("token"), col("n"),
      array_join(col("syms"), "").as("spelled"),
      size(col("syms")).as("n_syms"),
      length(col("token")).as("n_chars")).collect()
    assert(v.forall(r => r.getString(2) == r.getString(0)),
      "symbolization does not spell the token back")
    val symTotal = v.map(r => r.getLong(1) * r.getInt(3)).sum
    val charTotal = v.map(r => r.getLong(1) * r.getInt(4)).sum
    assert(symTotal < charTotal,
      s"no compression: $symTotal symbols vs $charTotal chars")
  }

  test("persisted BPE artifact round-trips: the from-disk merge table " +
      "and dictionary equal a fresh in-memory training run") {
    import org.apache.spark.sql.functions._
    // qTextBpe serves from the persisted artifact (round 13); a DIRECT
    // bpeTrain call bypasses the artifact entirely — equality pins both
    // the parquet round-trip and cross-run training determinism
    val fromDisk = text.Analysis.qTextBpe(spark, sf0001).collect()
      .map(r => (r.getInt(0), r.getString(1), r.getString(2),
        r.getLong(4))).toSeq
    val (merges, vocab) = text.Analysis.bpeTrain(spark, sf0001, 50)
    val direct = merges.zipWithIndex
      .map { case ((l, r, w), i) => (i + 1, l, r, w) }
    assert(fromDisk == direct,
      s"persisted merge table diverged from a fresh train; first diff: " +
        s"${fromDisk.zip(direct).find { case (a, b) => a != b }}")
    // the persisted dictionary must carry the same per-word
    // symbolization lengths the apply path broadcast-joins on
    val base = text.Analysis.bpeArtifact(spark, sf0001)
    val diskDict = spark.read.parquet(s"$base/vocab")
      .select(col("token"), size(col("syms")).as("n")).collect()
      .map(r => r.getString(0) -> r.getInt(1)).toMap
    val directDict = vocab
      .select(col("token"), size(col("syms")).as("n")).collect()
      .map(r => r.getString(0) -> r.getInt(1)).toMap
    assert(diskDict == directDict,
      "persisted dictionary diverged from a fresh train")
  }

  test("BPE apply's merge fold reproduces every trained symbolization, " +
      "and the corpus tokenization is consistent") {
    import org.apache.spark.sql.functions._
    val (merges, vocab) = text.Analysis.bpeTrain(spark, sf0001, 50)
    val pairs = merges.map { case (l, r, _) => (l, r) }
    // dictionary consistency: the OOV fold (bpeSymCount) is the SAME
    // algorithm the trainer ran — applying it to every in-vocabulary
    // word must land exactly on the trained symbol count
    vocab.select(col("token"), size(col("syms")).as("n")).collect()
      .foreach { r =>
        val (tok, n) = (r.getString(0), r.getInt(1))
        assert(text.Analysis.bpeSymCount(pairs)(tok) == n,
          s"fold disagrees with training on in-vocab word '$tok'")
      }
    // corpus invariants: 1 ≤ bpe tokens ≤ chars per doc, and the global
    // tokenization must compress (chars strictly exceed bpe tokens)
    val rows = text.Analysis.qTextBpeApply(spark, sf0001).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    assert(rows.nonEmpty)
    rows.foreach { case (doc, words, bpe, chars) =>
      assert(bpe >= words && bpe <= chars,
        s"doc $doc: words=$words bpe=$bpe chars=$chars out of order")
    }
    assert(rows.map(_._3).sum < rows.map(_._4).sum,
      "learned merges failed to compress the corpus")
  }
}
