package graft.streaming

import java.util.OptionalLong

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.connector.read.{Batch, InputPartition,
  PartitionReaderFactory, Scan, ScanBuilder, Statistics,
  SupportsPushDownFilters, SupportsPushDownRequiredColumns,
  SupportsReportStatistics}
import org.apache.spark.sql.connector.read.streaming.MicroBatchStream
import org.apache.spark.sql.graft.PlanBridge
import org.apache.spark.sql.sources
import org.apache.spark.sql.types.StructType

import graft.sources.TxTable

/** DSv2 BATCH read over the transactional table (round 18): the same
  * `txtable` format that already streams the commit log now serves
  * `spark.read.format("txtable").load(root)` — and because it is a real
  * DataSource V2 scan, CATALYST drives the table format's own pruning
  * machinery instead of a library-side helper:
  *
  *  - FILTER PUSHDOWN → DATA SKIPPING. Catalyst pushes the query's
  *    `sources.Filter`s into [[TxTableScanBuilder.pushFilters]]; the
  *    convertible subtree (=, <, <=, >, >=, IN, AND, OR over
  *    attr-vs-literal) becomes the same normalized predicate tree
  *    [[TxTable.snapshotWhere]] prunes with, and `planInputPartitions`
  *    plans ONLY the data files whose manifest min/max stats may hold a
  *    matching row. Every filter is ALSO returned as residual, so Spark
  *    re-evaluates rows inside kept files — files prune, rows filter,
  *    exactly the Delta/Iceberg split, and soundness never depends on
  *    the skipping layer. Partition pruning rides for free (partition
  *    path segments are min=max "part" stats — one mechanism).
  *  - COLUMN PRUNING. `pruneColumns` narrows the read schema; the
  *    per-file reader projects each parquet file to exactly the
  *    surviving columns it physically carries (footer-resolved), so an
  *    unused column's pages are never decoded.
  *  - MERGE-ON-READ deletes apply IN THE READER: each planned file's
  *    position-delete addresses ride its [[TxFilePartition]] (sorted
  *    row indexes, commit-bounded — the Iceberg/Delta shape of shipping
  *    per-file delete vectors to the scan), and the reader skips those
  *    ordinals while iterating. No join above the scan.
  *  - TIME TRAVEL via `option("versionAsOf", v)`; each version reads
  *    under its own column mapping and tracked schema (a pre-rename
  *    snapshot serves pre-rename names, a pre-promotion snapshot the
  *    narrow types).
  *  - SCHEMA INFERENCE from the manifest-tracked schema (`tblschema`) —
  *    `.load(root)` needs no `.schema(...)` on a schema-tracking table,
  *    and inference is O(1) manifest metadata, zero file footers.
  *  - [[SupportsReportStatistics]] hands Catalyst the manifest's row
  *    counts and file sizes FOR THE PRUNED file set, so the optimizer
  *    sizes joins (e.g. broadcast decisions) from post-skipping
  *    cardinality, not raw table size.
  *
  * Scale shape: planning is driver-side manifest arithmetic
  * (commit-bounded name lists + stats lines); each kept file is one
  * input partition opened on executors by the vectorized parquet
  * reader. At 100 TB a selective predicate plans the handful of files
  * its ranges touch — the scan never lists, opens, or footers the rest.
  */
private[streaming] class TxTableScanBuilder(declared: StructType,
    root: String, versionAsOf: Option[Int], skipChange: Boolean,
    maxVersions: Int, startingVersion: Option[String])
    extends ScanBuilder with SupportsPushDownFilters
    with SupportsPushDownRequiredColumns {

  private var required: StructType = declared
  private var pushed: Array[sources.Filter] = Array.empty

  /** Record the convertible filters for file skipping; return ALL
    * filters as residual — the stats layer prunes whole files, Spark
    * still evaluates rows inside kept files (sound by construction). */
  override def pushFilters(filters: Array[sources.Filter])
      : Array[sources.Filter] = {
    pushed = filters.filter(f => TxFilterTree.convert(f).isDefined)
    filters
  }
  override def pushedFilters(): Array[sources.Filter] = pushed

  override def pruneColumns(requiredSchema: StructType): Unit =
    required = requiredSchema

  override def build(): Scan = new TxTableScan(required, pushed, root,
    versionAsOf, skipChange, maxVersions, startingVersion)
}

/** One Scan serving both read modes: `toBatch` plans the (possibly
  * time-traveled) snapshot with stats skipping; `toMicroBatchStream`
  * subscribes to the commit log (round 17's source, unchanged). */
private[streaming] class TxTableScan(required: StructType,
    pushed: Array[sources.Filter], root: String, versionAsOf: Option[Int],
    skipChange: Boolean, maxVersions: Int, startingVersion: Option[String])
    extends Scan with Batch with SupportsReportStatistics {

  override def readSchema(): StructType = required
  override def toBatch: Batch = this
  override def toMicroBatchStream(checkpointLocation: String)
      : MicroBatchStream =
    new TxTableMicroBatchStream(required, root, skipChange, maxVersions,
      startingVersion)

  private lazy val readVersion: Int =
    versionAsOf.getOrElse(TxTable.currentVersion(root))
  private lazy val manifest: Option[TxTable.Manifest] =
    if (readVersion <= 0) None
    else Some(TxTable.readManifest(root, readVersion))

  /** (kept, all-data-entries) under the pushed predicate tree — the
    * files-planned < files-listed evidence, surfaced in
    * [[description]] for plan audits. */
  private lazy val pruned: (Seq[String], Seq[String]) = manifest match {
    case None => (Nil, Nil)
    case Some(m) =>
      TxTable.pruneDataFilesTree(m, TxFilterTree.treeOf(pushed))
  }

  override def description(): String = {
    val (kept, all) = pruned
    s"txtable $root v$readVersion, files planned ${kept.size}/" +
      s"${all.size}, PushedFilters: [${pushed.mkString(", ")}], " +
      s"ReadSchema: ${required.catalogString}"
  }

  /** One kept data file → one partition, carrying the read version's
    * column mapping and the file's own position-delete ordinals
    * (commit-bounded, sorted — the reader skips them while iterating,
    * the Iceberg per-file delete-vector hand-off). */
  override def planInputPartitions(): Array[InputPartition] = {
    require(!required.fieldNames.contains("_commit_version"),
      "_commit_version is the streaming CDF column; a batch snapshot " +
        "read has no per-row commit provenance — drop it from the " +
        "schema or use readStream")
    manifest match {
      case None => Array.empty
      case Some(m) =>
        val (kept, _) = pruned
        val logToPhys = TxTable.colMapOf(m)
          .map(_.logToPhys).getOrElse(Map.empty[String, String])
        kept.map { f =>
          val fname = f.substring(f.lastIndexOf('/') + 1)
          TxFilePartition(readVersion, s"$root/$f", logToPhys,
            dvByFile.getOrElse(fname, TxFilePartition.NoDeletes))
        }.toArray[InputPartition]
    }
  }

  /** The snapshot's position deletes grouped per target file, sorted by
    * ordinal. Driver-side and commit-bounded by the same argument as
    * the manifest itself: a delete vector is KBs of addresses (that is
    * the point of merge-on-read), and compaction materializes it away.
    * Cached — planning and statistics estimation share one read. */
  private lazy val dvByFile: Map[String, Array[Long]] = manifest match {
    case None => Map.empty
    case Some(m) =>
      val dvs = TxTable.deleteEntries(m.files)
      if (dvs.isEmpty) Map.empty
      else SparkSession.active.read
        .parquet(dvs.map(f => s"$root/$f"): _*)
        .select("fname", "pos").collect()
        .groupBy(_.getString(0))
        .map { case (f, rows) => f -> rows.map(_.getLong(1)).sorted }
  }

  override def createReaderFactory(): PartitionReaderFactory =
    TxTableReaderFactory(required)

  /** Post-skipping cardinality from manifest stats: row counts summed
    * over the PLANNED files only (minus their delete-vector ordinals),
    * sizes from the filesystem. Catalyst's join sizing then sees what
    * the scan will actually produce, not the raw table. */
  override def estimateStatistics(): Statistics = {
    val (kept, _) = pruned
    val m = manifest
    val rows = m.flatMap { mf =>
      val st = kept.map(mf.stats.get)
      if (st.exists(_.isEmpty)) None
      else {
        val dvDeleted = dvByFile.values.map(_.length.toLong).sum
        Some(st.flatten.map(_.rows).sum - dvDeleted)
      }
    }
    val bytes = kept.map(f => new java.io.File(root, f).length()).sum
    new Statistics {
      override def sizeInBytes(): OptionalLong = OptionalLong.of(bytes)
      override def numRows(): OptionalLong =
        rows.fold(OptionalLong.empty())(OptionalLong.of)
    }
  }
}

/** `sources.Filter` → [[PlanBridge.PredNode]]: the normalization that
  * lets Catalyst-pushed batch filters drive the SAME sound may-match
  * evaluator as the library-side `snapshotWhere`. Unconvertible shapes
  * become Opaque/None — the file is kept, never wrongly pruned. */
private[streaming] object TxFilterTree {
  import PlanBridge._

  def convert(f: sources.Filter): Option[PredNode] = f match {
    case sources.EqualTo(a, v) => leaf("=", a, v)
    case sources.EqualNullSafe(a, v) if v != null => leaf("=", a, v)
    case sources.LessThan(a, v) => leaf("<", a, v)
    case sources.LessThanOrEqual(a, v) => leaf("<=", a, v)
    case sources.GreaterThan(a, v) => leaf(">", a, v)
    case sources.GreaterThanOrEqual(a, v) => leaf(">=", a, v)
    case sources.In(a, vs) if vs.nonEmpty && !a.contains('.') =>
      Some(PredIn(a, vs.toSeq))
    // AND may prune by the understood conjunct alone (a file pruned by
    // one conjunct cannot hold a row satisfying both)
    case sources.And(l, r) => (convert(l), convert(r)) match {
      case (Some(a), Some(b)) => Some(PredAnd(a, b))
      case (one, other) => one.orElse(other)
    }
    // OR is sound only when BOTH branches are understood
    case sources.Or(l, r) =>
      for { a <- convert(l); b <- convert(r) } yield PredOr(a, b)
    case _ => None
  }

  private def leaf(op: String, a: String, v: Any): Option[PredNode] =
    if (a.contains('.')) None // nested attribute: stats are flat — keep
    else Some(PredCmp(op, a, v))

  def treeOf(fs: Array[sources.Filter]): PredNode =
    fs.flatMap(convert).reduceOption(PredAnd(_, _)).getOrElse(Opaque)
}
