package graft

import org.scalatest.funsuite.AnyFunSuite

/** Golden-row assertions (FIXTURES.md, computed with DuckDB 1.0.0 at
  * sf0.001) for the flagship aggregate, plus structural invariants of the
  * core relational operators. */
class GoldenSpec extends AnyFunSuite with SparkFixture {

  test("q_agg_hash reproduces the FIXTURES.md golden rows at sf0.001") {
    val rows = relational.Aggregates.qAggHash(spark, sf0001)
      .collect()
      .map(r => (r.getString(0), r.getString(1), r.getDouble(2),
        r.getDouble(3), r.getDouble(4), r.getDouble(5), r.getLong(7)))
    // FIXTURES.md prints sum_disc_price at 2dp; the query rounds at 4dp
    // (the exact grid of price·(1−disc)). 4dp values recomputed with
    // DuckDB 1.0.0 on the same filter/grouping.
    val golden = Seq(
      ("A", "F", 13096.0, 26731890.14, 25368762.5198, 25.678431, 510L),
      ("A", "O", 13173.0, 27267029.09, 25899278.959, 24.668539, 534L),
      ("N", "F", 15619.0, 31788102.13, 30158055.965, 26.294613, 594L),
      ("N", "O", 13130.0, 27778238.79, 26325536.7587, 24.867424, 528L),
      ("R", "F", 13038.0, 28543439.97, 27069022.8592, 24.553672, 531L),
      ("R", "O", 13188.0, 27674702.11, 26333407.7788, 24.977273, 528L))
    assert(rows.toSeq == golden)
  }

  test("entry (flagship) returns rows") {
    assert(SparkEntry.entry(spark).count() == 6)
  }

  test("every oracleSql key has a queries entry and keys are unique") {
    assert(SparkEntry.oracleSql.keySet.subsetOf(SparkEntry.queries.keySet))
    assert(SparkEntry.queries.size == 206,
      s"expected the SURVEY §2 206-key inventory (202 as of round 19 + " +
        s"round 20's q_table_agg_pushdown/q_table_spj/" +
        s"q_table_merge_cdc/q_table_maintenance), " +
        s"got ${SparkEntry.queries.size}")
    assert(SparkEntry.oracleSql.size == 178,
      s"expected 178 oracle-checked keys, got ${SparkEntry.oracleSql.size}")
  }

  test("q_limit_topk is the top-25 of q_sort-style ordering") {
    val top = relational.Core.qLimitTopk(spark, sf0001).collect()
    assert(top.length == 25)
    val prices = top.map(_.getDouble(2))
    assert(prices.zip(prices.tail).forall { case (a, b) => a >= b })
  }

  test("q_offset_page continues exactly where q_limit_topk ends") {
    val page1 = relational.Core.qLimitTopk(spark, sf0001)
      .collect().map(_.getDouble(2))
    val page2 = relational.Core.qOffsetPage(spark, sf0001)
      .collect().map(_.getDouble(2))
    assert(page2.length == 25)
    assert(page1.last >= page2.head)
  }

  test("q_sample_det is deterministic across runs") {
    val a = relational.Core.qSampleDet(spark, sf0001).collect()
    val b = relational.Core.qSampleDet(spark, sf0001).collect()
    assert(a.sameElements(b))
  }

  test("q_split_hash realizes ~90/5/5 fractions and partitions the corpus") {
    val rows = llm.Governance.qSplitHash(spark, sf0001).collect()
    val bySplit = rows.groupBy(_.getString(0))
      .view.mapValues(_.map(_.getLong(2)).sum).toMap
    val total = bySplit.values.sum.toDouble
    assert(bySplit.keySet == Set("train", "val", "test"))
    // hash-bucket split: binomial tolerance around 90/5/5 at n=500
    assert(bySplit("train") / total > 0.85 && bySplit("train") / total < 0.95)
    assert(bySplit("val") / total < 0.10 && bySplit("test") / total < 0.10)
  }

  test("q_text_vocab ranks are contiguous and count-ordered") {
    val rows = text.Analysis.qTextVocab(spark, sf0001).collect()
    assert(rows.map(_.getInt(0)).toSeq == (1 to rows.length))
    val counts = rows.map(_.getLong(2))
    assert(counts.zip(counts.tail).forall { case (a, b) => a >= b })
    assert(counts.forall(_ >= 5))
  }

  test("q_dedup_minhash finds the n-gram Jaccard pairs (LSH recall) and " +
      "nothing else (exact-filter precision)") {
    val exact = llm.DedupVariants.qDedupNgram(spark, sf0001)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val lsh = llm.DedupVariants.qDedupMinhash(spark, sf0001)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    // precision 1.0 by construction (the final filter IS the exact
    // Jaccard); recall bounded by banding: 1-(1-j²)⁴ ≈ 1 at j ≈ 0.99
    assert(lsh.subsetOf(exact), s"false positives: ${lsh -- exact}")
    assert(exact.nonEmpty &&
      lsh.size.toDouble / exact.size >= 0.9,
      s"LSH recall ${lsh.size}/${exact.size} below 0.9")
  }

  test("minhash band-manifest write-back is idempotent: day 2 admits " +
      "zero banded docs") {
    val (day1, day2) = llm.DedupVariants.minhashManifestRoundtrip(
      spark, sf0001)
    // day 1 must genuinely admit docs (or the test proves nothing) …
    assert(day1 > 0, "day-1 run admitted no docs — fixture degenerate")
    // … and the SAME crawl against the written-back manifest admits none:
    // every admitted doc now self-collides at Jaccard 1.0, every rejected
    // doc still collides with its original prior dup.
    assert(day2 == 0L, s"day-2 run re-admitted $day2 docs — write-back " +
      "manifest is incomplete")
  }

  test("q_dedup_manifest_update audit rows prove the exact-prefix loop " +
      "closes: day 2 admits zero") {
    val rows = llm.DedupVariants.qDedupManifestUpdate(spark, sf0001)
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(rows("day1_new") > 0)
    assert(rows("day2_new") == 0L)
    // the manifest must grow by EXACTLY the distinct admitted prefixes —
    // recomputed independently from q_dedup_incremental, which shares the
    // probe definition (manifestAntiJoin) but none of the write-back code
    // (ADVICE r10: the previous arithmetic here was tautological)
    val admittedPrefixes = llm.DedupVariants.qDedupIncremental(spark, sf0001)
      .select("prefix_md5").distinct().count()
    assert(admittedPrefixes > 0 && admittedPrefixes <= rows("day1_new"))
    assert(rows("manifest_after") - rows("manifest_before")
      == admittedPrefixes)
  }

  test("q_profile_table stats are internally consistent with the table") {
    val n = Tables.lineitem(spark, sf0001).count()
    val rows = relational.Stats.qProfileTable(spark, sf0001).collect()
    assert(rows.length == 4)
    rows.foreach { r =>
      val (nn, nulls) = (r.getLong(1), r.getLong(2))
      assert(nn + nulls == n,
        s"${r.getString(0)}: non-null $nn + null $nulls != table rows $n")
      assert(r.getLong(3) <= nn) // distinct ≤ non-null
      assert(r.getDouble(4) <= r.getDouble(6) &&
        r.getDouble(6) <= r.getDouble(5)) // min ≤ avg ≤ max
    }
  }

  test("q_unpivot emits exactly 4 long rows per lineitem row") {
    val n = Tables.lineitem(spark, sf0001).count()
    assert(relational.Extended.qUnpivot(spark, sf0001).count() == 4 * n)
  }

  test("q_gap_islands islands are maximal consecutive-day runs") {
    val rows = relational.TimeSeries.qGapIslands(spark, sf0001).collect()
      .map(r => (r.getLong(0), r.getDate(1), r.getDate(2), r.getLong(3)))
    // consecutive: span == day count
    assert(rows.forall { case (_, s0, s1, nd) =>
      (s1.toLocalDate.toEpochDay - s0.toLocalDate.toEpochDay) + 1 == nd })
    // maximal: islands of one user never touch or overlap
    rows.groupBy(_._1).values.foreach { is =>
      val sorted = is.sortBy(_._2.toLocalDate.toEpochDay)
      assert(sorted.zip(sorted.tail).forall { case ((_, _, e, _), (_, s, _, _)) =>
        s.toLocalDate.toEpochDay > e.toLocalDate.toEpochDay + 1 })
    }
  }

  test("q_ts_resample densifies to the full hour×type grid and conserves " +
      "event counts") {
    val ev = Tables.events(spark, sf0001)
    val nTypes = ev.select("event_type").distinct().count()
    val rows = relational.TimeSeries.qTsResample(spark, sf0001).collect()
    assert(rows.length % nTypes == 0)
    assert(rows.map(_.getLong(2)).sum == ev.count(),
      "bucket counts must sum to the event count")
    // LOCF: filled value never null, 0 before first observation
    assert(rows.forall(!_.isNullAt(3)))
  }

  test("q_quantile_bins is equal-frequency within rounding (deciles)") {
    val rows = relational.Stats.qQuantileBins(spark, sf0001).collect()
    assert(rows.length == 10)
    val ns = rows.map(_.getLong(1))
    // exact percentile cutoffs: bins differ by at most the tie mass
    assert(ns.max - ns.min <= ns.sum / 10 / 2,
      s"bins should be near-uniform, got ${ns.mkString(",")}")
    // bins tile the value range: hi(b) <= lo(b+1)
    val bounds = rows.map(r => (r.getDouble(2), r.getDouble(3)))
    assert(bounds.zip(bounds.tail).forall { case ((_, hi), (lo2, _)) =>
      hi <= lo2 })
  }
}
