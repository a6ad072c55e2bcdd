package graft

import org.scalatest.funsuite.AnyFunSuite

/** Write-side layout operators (sources/Layout.scala): compaction
  * file-count bound + schema-evolution merge semantics — the structural
  * halves the identity oracles can't see. */
class LayoutSpec extends AnyFunSuite with SparkFixture {

  test("q_write_compact emits exactly the planned file count and " +
      "contiguous doc_id ranges per file") {
    val (readBack, path, nFiles) = sources.Layout.writeCompact(spark, sf0001)
    val files = new java.io.File(path).listFiles()
      .filter(_.getName.endsWith(".parquet"))
    // repartitionByRange(nFiles) → one file per partition; the
    // maxRecordsPerFile belt only splits under pathological range skew,
    // which the uniform doc_id fixture doesn't have
    assert(files.length == nFiles,
      s"planned $nFiles files, wrote ${files.length}")
    assert(nFiles > 1, "fixture must exercise multi-file compaction")
    // range layout: per-file [min,max] doc_id spans must not overlap —
    // this is what keeps downstream min/max row-group pruning effective
    val spans = files.sortBy(_.getName).toSeq.map { f =>
      val d = spark.read.parquet(f.getPath)
        .agg(org.apache.spark.sql.functions.min("doc_id"),
          org.apache.spark.sql.functions.max("doc_id"))
        .head()
      (d.getLong(0), d.getLong(1))
    }.sortBy(_._1)
    assert(spans.zip(spans.tail).forall { case ((_, hi), (lo, _)) =>
      hi < lo }, s"file doc_id ranges overlap: $spans")
    // and the layout change preserved the row count
    assert(readBack.count() == Tables.documents(spark, sf0001).count())
  }

  test("q_schema_evolution backfills NULL lang exactly for the " +
      "pre-drift drop") {
    val rows = sources.Layout.qSchemaEvolution(spark, sf0001).collect()
    assert(rows.nonEmpty)
    // even ids came from the base-schema drop → lang must be null;
    // odd ids from the post-drift drop → lang must be populated
    assert(rows.forall { r =>
      if (r.getLong(0) % 2 == 0) r.isNullAt(2) else !r.isNullAt(2) })
  }
}
