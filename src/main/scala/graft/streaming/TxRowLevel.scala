package graft.streaming

import org.apache.spark.sql.connector.read.ScanBuilder
import org.apache.spark.sql.connector.write.{LogicalWriteInfo,
  RowLevelOperation, RowLevelOperationBuilder, RowLevelOperationInfo,
  WriteBuilder, WriterCommitMessage}
import org.apache.spark.sql.util.CaseInsensitiveStringMap

import graft.sources.TxTable

/** SQL row-level DML (round 19, VERDICT r18 item 3): `DELETE FROM`,
  * `UPDATE` and `MERGE INTO` over catalog-addressed txtable tables,
  * via Spark's GROUP-BASED row-level-operation hooks — the same
  * machinery Iceberg's copy-on-write mode rides:
  *
  *  - Catalyst's analyzer rewrites the DML into a ReplaceData plan:
  *    a scan of the table plus a query RECOMPUTING the surviving /
  *    updated / merged rows, written back through this operation.
  *  - GROUP SELECTION IS FILE PRUNING. The planner pushes the command's
  *    condition into [[TxTableScanBuilder.pushFilters]] purely to let
  *    the source skip whole groups — which for this format is exactly
  *    the manifest-stats file skipping the batch scan already does. A
  *    selective `DELETE FROM t WHERE k = 5` therefore rewrites only the
  *    files whose min/max may hold k=5, never the table. (A MERGE's ON
  *    condition references the source relation, so nothing is pushable
  *    and every file is a group — the documented copy-on-write MERGE
  *    cost without runtime group filtering.)
  *  - THE SCAN AND THE WRITE SHARE THIS OPERATION INSTANCE: the scan
  *    records the files it planned (the groups), the version it read,
  *    and the position-delete set its recomputation absorbed; the
  *    write's commit replaces exactly those files with the staged
  *    recomputation — `prev − planned ++ staged` — under the same OCC
  *    conflict checks as the library rewrite paths ([[TxTable
  *    .rewriteCommit]]): planned files must still be current (no
  *    concurrent rewrite), the DV set must be unchanged (a concurrent
  *    merge-on-read delete must not be resurrected), and the
  *    schema/colmap props must match what the write planned against.
  *  - METADATA-DELETE FAST PATH. [[TxTableTable]] also implements
  *    SupportsDelete: a `DELETE FROM … WHERE` whose condition converts
  *    entirely to source filters never rewrites a file — the optimizer
  *    swaps the ReplaceData plan back to [[TxTable.deleteVector]]'s
  *    position-delete commit (O(matching rows) merge-on-read, the
  *    Iceberg/Delta DV shape). Subquery or otherwise unconvertible
  *    conditions keep the group-based copy-on-write path. Both engines
  *    pre-date this surface; SQL is a third door onto them.
  *
  * Scale shape: group planning is driver-side manifest arithmetic; the
  * recomputation is a distributed scan+write of ONLY the affected
  * files' rows; the commit is manifest metadata. An unselective UPDATE
  * rewrites what it touches — the same bound as every copy-on-write
  * engine. */
private[streaming] class TxRowLevelOperationBuilder(root: String,
    info: RowLevelOperationInfo) extends RowLevelOperationBuilder {
  override def build(): RowLevelOperation =
    new TxRowLevelOperation(root, info.command)
}

/** What the row-level scan planned: the read version, the kept data
  * files (= the groups the write replaces), and the delete-entry set
  * the recomputation applied. */
private[streaming] case class TxPlannedGroups(version: Int,
    kept: Seq[String], dvs: Seq[String])

private[streaming] class TxRowLevelOperation(root: String,
    cmd: RowLevelOperation.Command) extends RowLevelOperation {

  /** Set by the shared scan's planInputPartitions; read by the write's
    * commit. Volatile: planning and commit run on driver threads that
    * need not be the same one. */
  @volatile private[streaming] var planned: Option[TxPlannedGroups] = None

  override def command(): RowLevelOperation.Command = cmd
  override def description(): String = s"txtable group-based $cmd"

  override def newScanBuilder(options: CaseInsensitiveStringMap)
      : ScanBuilder = {
    val v = TxTable.currentVersion(root)
    val schema = TxTable.inferLogicalSchema(root, v).getOrElse(
      sys.error(s"row-level DML needs a schema-tracking table at $root"))
    // PARTITIONED targets get runtime group filtering at partition
    // grain (see TxRuntimeFilteredScan — the attribute must be
    // group-constant, which only the partition column is)
    val m = TxTable.readManifest(root, v)
    val partLogical = TxTable.partitionColumn(m).map(p =>
      TxTable.colMapOf(m).flatMap(_.physToLog.get(p)).getOrElse(p))
    new TxTableScanBuilder(schema, root, versionAsOf = None,
      skipChange = false, maxVersions = Int.MaxValue,
      startingVersion = None, recorder = Some(this),
      runtimePartCol = partLogical)
  }

  override def newWriteBuilder(info: LogicalWriteInfo): WriteBuilder =
    new WriteBuilder {
      override def build(): org.apache.spark.sql.connector.write.Write =
        new TxGroupReplaceWrite(root, info.schema(),
          TxRowLevelOperation.this)
    }
}

/** The ReplaceData write: stages the recomputed rows with the ordinary
  * DSv2 writer (schema contract, partitioned routing and all) and
  * commits `prev − plannedGroups ++ staged` — one atomic version, with
  * the scan-to-commit conflict checks spelled out on
  * [[TxRowLevelOperationBuilder]]. */
private[streaming] class TxGroupReplaceWrite(root: String,
    querySchema: org.apache.spark.sql.types.StructType,
    op: TxRowLevelOperation)
    extends TxTableBatchWrite(root, querySchema, overwrite = false) {

  /** Group-based rewritten plans prepend the `__row_operation` int
    * marker to every row and (with no metadata attributes requested)
    * hand it through unprojected — see
    * [[TxTableBatchWrite.rowIndexOffset]]. Skip past it. */
  override protected def rowIndexOffset: Int = 1

  private def opName: String = op.command() match {
    case RowLevelOperation.Command.DELETE => "delete"
    case RowLevelOperation.Command.UPDATE => "update"
    case RowLevelOperation.Command.MERGE => "merge"
  }

  override def commit(messages: Array[WriterCommitMessage]): Unit = {
    val staged = messages.collect {
      case TxFileCommitMessage(ns) => ns
    }.toSeq.flatten.sorted
    val g = op.planned.getOrElse(sys.error(
      "txtable row-level write committed before its scan planned " +
        "groups — the ReplaceData contract shares one operation " +
        "instance between scan and write"))
    if (g.kept.isEmpty && staged.isEmpty) return // nothing matched: no-op
    val keptSet = g.kept.toSet
    try {
      TxTable.commitChecked(root, opName, { prev =>
        require(g.kept.forall(prev.toSet),
          s"concurrent rewrite conflict at $root: a file this $opName " +
            "read is no longer in the current snapshot — retry")
        require(TxTable.deleteEntries(prev) == g.dvs,
          s"concurrent position-delete conflict at $root: the delete " +
            s"set changed since this $opName read its input — " +
            "committing would resurrect freshly-deleted rows; retry")
        prev.filterNot(keptSet) ++ staged
      }, Map.empty, checkMeta): Unit
    } catch {
      case e: Throwable =>
        staged.foreach(f => java.nio.file.Files.deleteIfExists(
          java.nio.file.Paths.get(root, f)): Unit)
        throw e
    }
  }
}
