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
        // subtract only the PLANNED files' delete ordinals — a pruned
        // file's deletes never reduce what this scan produces
        val dvDeleted = kept
          .map(f => f.substring(f.lastIndexOf('/') + 1))
          .map(fn => dvByFile.get(fn).fold(0L)(_.length.toLong)).sum
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

/** DSv2 BATCH WRITE (round 18): `df.write.format("txtable")
  * .mode("append"|"overwrite").save(root)` appends to / replaces an
  * EXISTING schema-tracking table through the same OCC manifest commit
  * as every library write path — completing the DSv2 surface
  * (batch read + streaming read + batch write).
  *
  *  - EXECUTOR-SIDE STAGING. Each task writes its rows to a hidden
  *    `data/.part-…` file (never matched by any manifest or directory
  *    scan) via a parquet-hadoop writer, renames it visible at TASK
  *    commit, and reports the name in its commit message — Spark's
  *    positive-commit protocol means a failed/speculative task's file
  *    is deleted by its own abort, never listed.
  *  - ONE ATOMIC COMMIT. The driver publishes exactly the
  *    message-reported files: mode("append") as `prev ++ staged`,
  *    mode("overwrite") as `staged` alone (old files stay readable via
  *    time travel until vacuum; the streaming source classifies the
  *    removal as a change commit, like every rewrite). Commit-time
  *    footer lifting gives the new files min/max skipping stats
  *    automatically.
  *  - SCHEMA SAFETY IS THE SOURCE'S, at plan time. `save()` hands a
  *    TableProvider the frame's own schema (there is no catalog to
  *    resolve against), so the write itself validates the incoming
  *    frame against the MANIFEST-tracked schema when it builds: the
  *    column SET must match exactly (missing/unknown names fail loudly,
  *    by name — never positional guessing), matching columns must carry
  *    the declared type or a NARROWER numeric (the writer widens values
  *    to the declared type, so files stay type-uniform), and a WIDER
  *    incoming column fails pointing at [[TxTable.promoteColumnType]] —
  *    the same ALTER-before-write contract as the library append. The
  *    TABLE schema always wins; a DSv2 write can never drift it. The
  *    writer stages under the table's PHYSICAL column names (column
  *    mapping applied by name).
  *  - Honest limits, enforced loudly: the target must exist and track
  *    its schema (bootstrap = the library append / commitInit — the
  *    lakehouse CREATE-then-write flow), and partitioned tables take
  *    library [[TxTable.appendPartitioned]] (a DSv2 writer would need
  *    per-task dynamic-partition routing — real, just not built).
  *
  * Scale shape: rows never touch the driver — N tasks write N files in
  * parallel and ship NAMES; the driver's commit is manifest arithmetic
  * plus commit-bounded footer stats reads. */
private[streaming] class TxTableWriteBuilder(root: String,
    querySchema: StructType)
    extends org.apache.spark.sql.connector.write.WriteBuilder
    with org.apache.spark.sql.connector.write.SupportsTruncate {
  private var overwrite = false
  override def truncate()
      : org.apache.spark.sql.connector.write.WriteBuilder = {
    overwrite = true; this
  }
  override def build(): org.apache.spark.sql.connector.write.Write =
    new TxTableBatchWrite(root, querySchema, overwrite)
}

private[streaming] case class TxFileCommitMessage(name: String)
    extends org.apache.spark.sql.connector.write.WriterCommitMessage

private[streaming] class TxTableBatchWrite(root: String,
    querySchema: StructType, overwrite: Boolean)
    extends org.apache.spark.sql.connector.write.Write
    with org.apache.spark.sql.connector.write.BatchWrite
    with org.apache.spark.sql.connector.write.streaming.StreamingWrite {
  import org.apache.spark.sql.connector.write._
  import org.apache.spark.sql.types.StructField

  override def toBatch: BatchWrite = this

  // both parent traits default-define this; Scala requires the diamond
  // be resolved explicitly (same semantics: tasks commit via the
  // driver's coordinator, which is what makes speculative attempts safe)
  override def useCommitCoordinator(): Boolean = true

  /** The DSv2 STREAMING sink (round 18): `writeStream.format("txtable")`
    * — the native twin of the foreachBatch+[[TxTable.commitBatch]]
    * pattern, same exactly-once contract, no user glue code. Each
    * micro-batch's tasks stage hidden files exactly like the batch
    * writer; the epoch commit is [[TxTable.commitEpoch]]: a replayed
    * epoch (≤ the table's `lastbatch` high-water) DISCARDS its staged
    * files and no-ops, so a failure between sink commit and checkpoint
    * record never double-appends. Append output mode only — complete/
    * update rewrite history, which is a table rewrite commit's job. */
  override def toStreaming
      : org.apache.spark.sql.connector.write.streaming.StreamingWrite = {
    require(!overwrite,
      "txtable streaming sink supports append output mode only")
    fields: Unit // force plan-time validation at stream start
    this
  }
  override def createStreamingWriterFactory(info: PhysicalWriteInfo)
      : org.apache.spark.sql.connector.write.streaming
        .StreamingDataWriterFactory =
    TxTableStreamWriterFactory(root,
      StructType(fields.map { case (p, _, d) => StructField(p, d) }),
      StructType(fields.map { case (p, q, _) => StructField(p, q) }))
  override def commit(epochId: Long,
      messages: Array[WriterCommitMessage]): Unit =
    TxTable.commitEpoch(root, epochId, messages.collect {
      case TxFileCommitMessage(n) => n
    }.toSeq.sorted, checkMeta): Unit
  override def abort(epochId: Long,
      messages: Array[WriterCommitMessage]): Unit =
    abort(messages)

  /** Plan-time guards + schema contract (the loud boundaries the
    * scaladoc declares), evaluated once at build: resolves the
    * manifest-tracked LOGICAL schema and validates the incoming frame
    * against it BY NAME. Returns, in query-column order, (physical
    * name, incoming type, declared type) — the writer reads values
    * through the incoming getter and widens to the declared type. */
  /** The schema/colmap props this write PLANNED against — the commit
    * refuses to land if a concurrent rename/drop/promote changed them
    * ([[TxTable.commitChecked]]): the staged files carry the planned
    * physical names and declared types, so landing them under changed
    * metadata would silently drift the table. */
  private var plannedMeta: Map[String, String] = Map.empty
  private def checkMeta(cur: Map[String, String]): Unit = {
    val now = cur.filter { case (k, _) => TxTable.SchemaProps(k) }
    if (now != plannedMeta) sys.error(
      s"txtable DSv2 write to $root planned against a schema/column-" +
        "mapping that a concurrent rename/drop/promote commit changed " +
        "— aborting instead of drifting the table; retry the write")
  }

  private val fields: Seq[(String,
      org.apache.spark.sql.types.DataType,
      org.apache.spark.sql.types.DataType)] = {
    val v = TxTable.currentVersion(root)
    require(v > 0, s"txtable DSv2 write needs an existing table at " +
      s"$root — bootstrap with the library append (the CREATE-then-" +
      "write flow), then df.write.format(\"txtable\") appends")
    val m = TxTable.readManifest(root, v)
    plannedMeta = m.props.filter { case (k, _) => TxTable.SchemaProps(k) }
    require(TxTable.partColOf(TxTable.dataEntries(m.files)).isEmpty,
      s"txtable DSv2 write targets flat tables; $root is partitioned — " +
        "use TxTable.appendPartitioned")
    val declared = TxTable.inferLogicalSchema(root, v).getOrElse(
      sys.error(s"txtable DSv2 write needs a schema-tracking table at " +
        s"$root (no tblschema manifest prop) — bootstrap with the " +
        "library append"))
    val declNames = declared.fieldNames.toSet
    val qNames = querySchema.fieldNames.toSet
    require(qNames == declNames,
      s"txtable DSv2 write: frame columns ${qNames.toSeq.sorted} must " +
        s"match the table schema ${declNames.toSeq.sorted} exactly " +
        "(resolution is by name; add-column evolution is the library " +
        "append's job)")
    val logToPhys = TxTable.colMapOf(m)
      .map(_.logToPhys).getOrElse(Map.empty[String, String])
    querySchema.fields.toSeq.map { qf =>
      val dt = declared(qf.name).dataType
      if (qf.dataType != dt && !TxTable.promotable(qf.dataType, dt))
        sys.error(if (TxTable.promotable(dt, qf.dataType))
          s"txtable DSv2 write widens column '${qf.name}' from " +
            s"${dt.sql} to ${qf.dataType.sql}: promote the declared " +
            "type first (promoteColumnType), so the widening is a " +
            "visible commit"
        else
          s"txtable DSv2 write: column '${qf.name}' is " +
            s"${qf.dataType.sql}, table declares ${dt.sql} — " +
            "incompatible")
      (logToPhys.getOrElse(qf.name, qf.name), qf.dataType, dt)
    }
  }

  override def createBatchWriterFactory(info: PhysicalWriteInfo)
      : DataWriterFactory =
    TxTableWriterFactory(root,
      StructType(fields.map { case (p, _, d) => StructField(p, d) }),
      StructType(fields.map { case (p, q, _) => StructField(p, q) }))

  override def commit(messages: Array[WriterCommitMessage]): Unit = {
    val staged = messages.collect {
      case TxFileCommitMessage(n) => n
    }.toSeq.sorted
    if (overwrite)
      TxTable.commitChecked(root, "overwrite", _ => staged,
        Map.empty, checkMeta): Unit
    else
      TxTable.commitChecked(root, "append", _ ++ staged,
        Map.empty, checkMeta): Unit
  }

  override def abort(messages: Array[WriterCommitMessage]): Unit =
    messages.foreach {
      case TxFileCommitMessage(n) =>
        java.nio.file.Files.deleteIfExists(
          java.nio.file.Paths.get(root, n)): Unit
      case _ => ()
    }
}

private[streaming] case class TxTableWriterFactory(root: String,
    physSchema: StructType, inSchema: StructType)
    extends org.apache.spark.sql.connector.write.DataWriterFactory {
  override def createWriter(partitionId: Int, taskId: Long)
      : org.apache.spark.sql.connector.write.DataWriter[
        org.apache.spark.sql.catalyst.InternalRow] =
    new TxTableDataWriter(root, physSchema, inSchema, partitionId, taskId)
}

private[streaming] case class TxTableStreamWriterFactory(root: String,
    physSchema: StructType, inSchema: StructType)
    extends org.apache.spark.sql.connector.write.streaming
      .StreamingDataWriterFactory {
  override def createWriter(partitionId: Int, taskId: Long,
      epochId: Long)
      : org.apache.spark.sql.connector.write.DataWriter[
        org.apache.spark.sql.catalyst.InternalRow] =
    new TxTableDataWriter(root, physSchema, inSchema, partitionId, taskId)
}

/** One task → one staged parquet file, written hidden
  * (`data/.part-…`, invisible to every directory scan and manifest),
  * renamed visible at task commit (same-directory rename:
  * metadata-only), deleted by abort. The parquet-hadoop Group writer
  * mirrors the reader's supported primitive set; footer min/max stats
  * come with the writer for free, which is what commit-time stats
  * lifting prunes on later. `physSchema` carries the DECLARED types the
  * file stores (and the physical names); `inSchema` the incoming row
  * types — a narrower numeric reads through its own getter and widens
  * here, so files stay type-uniform (the append write boundary's
  * cast-up, executor-side). */
private[streaming] class TxTableDataWriter(root: String,
    physSchema: StructType, inSchema: StructType, partitionId: Int,
    taskId: Long)
    extends org.apache.spark.sql.connector.write.DataWriter[
      org.apache.spark.sql.catalyst.InternalRow] {
  import org.apache.parquet.schema.{LogicalTypeAnnotation, Types => PT}
  import org.apache.parquet.schema.PrimitiveType.PrimitiveTypeName._
  import org.apache.spark.sql.types._

  private val fname =
    s"part-dsv2-$partitionId-$taskId-${java.util.UUID.randomUUID}.parquet"
  private val hiddenPath = new java.io.File(root, s"data/.$fname")

  private val messageType: org.apache.parquet.schema.MessageType = {
    val b = PT.buildMessage()
    physSchema.fields.foreach { f =>
      f.dataType match {
        case LongType => b.addField(
          PT.optional(INT64).named(f.name))
        case IntegerType => b.addField(
          PT.optional(INT32).named(f.name))
        case DoubleType => b.addField(PT.optional(DOUBLE).named(f.name))
        case FloatType => b.addField(PT.optional(FLOAT).named(f.name))
        case BooleanType => b.addField(
          PT.optional(BOOLEAN).named(f.name))
        case StringType => b.addField(PT.optional(BINARY)
          .as(LogicalTypeAnnotation.stringType()).named(f.name))
        case dt => sys.error(
          s"txtable DSv2 writer: unsupported column type $dt for " +
            s"${f.name} (supported: long/int/double/float/boolean/" +
            "string)")
      }
    }
    b.named("spark_schema")
  }

  private val writer = {
    val conf = new org.apache.hadoop.conf.Configuration()
    org.apache.parquet.hadoop.example.GroupWriteSupport
      .setSchema(messageType, conf)
    org.apache.parquet.hadoop.example.ExampleParquetWriter
      .builder(new org.apache.hadoop.fs.Path(hiddenPath.getPath))
      .withConf(conf)
      .withType(messageType)
      .build()
  }
  private val factory =
    new org.apache.parquet.example.data.simple.SimpleGroupFactory(
      messageType)

  override def write(row: org.apache.spark.sql.catalyst.InternalRow)
      : Unit = {
    val g = factory.newGroup()
    var i = 0
    while (i < physSchema.fields.length) {
      if (!row.isNullAt(i)) {
        val f = physSchema.fields(i)
        // read through the INCOMING type's getter, widen to declared
        (f.dataType, inSchema.fields(i).dataType) match {
          case (LongType, IntegerType) =>
            g.add(f.name, row.getInt(i).toLong)
          case (LongType, ShortType) =>
            g.add(f.name, row.getShort(i).toLong)
          case (LongType, ByteType) =>
            g.add(f.name, row.getByte(i).toLong)
          case (IntegerType, ShortType) =>
            g.add(f.name, row.getShort(i).toInt)
          case (IntegerType, ByteType) =>
            g.add(f.name, row.getByte(i).toInt)
          case (DoubleType, FloatType) =>
            g.add(f.name, row.getFloat(i).toDouble)
          case (LongType, _) => g.add(f.name, row.getLong(i))
          case (IntegerType, _) => g.add(f.name, row.getInt(i))
          case (DoubleType, _) => g.add(f.name, row.getDouble(i))
          case (FloatType, _) => g.add(f.name, row.getFloat(i))
          case (BooleanType, _) => g.add(f.name, row.getBoolean(i))
          case (StringType, _) => g.add(f.name,
            org.apache.parquet.io.api.Binary.fromString(
              row.getUTF8String(i).toString))
          case (dt, _) =>
            sys.error(s"unreachable: $dt passed schema check")
        }
      }
      i += 1
    }
    writer.write(g)
  }

  /** Hadoop's local ChecksumFileSystem shadows every write with a
    * `.<name>.crc` sibling; reclaim it with the data file (it would
    * otherwise leak as a stray hidden file next to the renamed one). */
  private def crcPath = new java.io.File(root, s"data/..$fname.crc")

  override def commit()
      : org.apache.spark.sql.connector.write.WriterCommitMessage = {
    writer.close()
    java.nio.file.Files.move(hiddenPath.toPath,
      new java.io.File(root, s"data/$fname").toPath): Unit
    java.nio.file.Files.deleteIfExists(crcPath.toPath): Unit
    TxFileCommitMessage(s"data/$fname")
  }

  override def abort(): Unit = {
    scala.util.Try(writer.close()): Unit
    java.nio.file.Files.deleteIfExists(hiddenPath.toPath): Unit
    java.nio.file.Files.deleteIfExists(crcPath.toPath): Unit
  }

  override def close(): Unit = ()
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
