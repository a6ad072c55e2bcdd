package graft.streaming

import java.util.{Map => JMap}

import org.apache.spark.sql.connector.catalog.{Identifier, SupportsNamespaces, Table, TableCatalog, TableChange}
import org.apache.spark.sql.connector.expressions.Transform
import org.apache.spark.sql.types.StructType
import org.apache.spark.sql.util.CaseInsensitiveStringMap

import graft.sources.TxTable

/** SQL catalog over the transactional table format (round 18): register
  * once —
  * {{{
  *   spark.conf.set("spark.sql.catalog.tx",
  *     classOf[TxTableCatalog].getName)
  *   spark.conf.set("spark.sql.catalog.tx.warehouse", "/data/tx")
  * }}}
  * — and the format is END-TO-END SQL-addressable:
  * `CREATE TABLE tx.db.t (…)`, `INSERT INTO` / `INSERT OVERWRITE`
  * (resolved through the catalog, so the ENGINE validates the frame
  * against the table schema — the half `save()` can't do),
  * `SELECT … FROM tx.db.t` (the DSv2 batch scan: stats skipping,
  * column pruning, post-skipping statistics), and time travel as SQL —
  * `SELECT … FROM tx.db.t VERSION AS OF 2` resolves through
  * [[loadTable(ident, version)]] to a version-pinned table whose scan
  * AND schema are that version's (a pre-rename/pre-promotion snapshot
  * serves its own names and types).
  *
  * Layout contract: a table `tx.ns….name` lives at
  * `<warehouse>/<ns…>/<name>` — the same roots the library/DataFrame
  * APIs address, so all three surfaces are views of ONE format (a
  * table created here can be appended by `df.write.format("txtable")`
  * and streamed by `readStream`). `CREATE TABLE` is [[TxTable]]'s
  * empty schema-tracking commit (v1 lists zero files, carries
  * `tblschema` — the metadata-only CREATE every real format does);
  * DROP deletes the directory; evolution (rename/drop/promote) stays
  * on the library's commit API — `ALTER TABLE` refuses loudly rather
  * than shadowing those semantics.
  *
  * Scale shape: every catalog operation is manifest metadata — create
  * is one manifest write, load is one manifest read (schema included —
  * zero data-file footers), list is a directory listing of table
  * roots. */
class TxTableCatalog extends TableCatalog with SupportsNamespaces {
  private var catalogName: String = _
  private var warehouse: String = _

  override def initialize(name: String,
      options: CaseInsensitiveStringMap): Unit = {
    catalogName = name
    warehouse = Option(options.get("warehouse")).getOrElse(sys.error(
      s"txtable catalog '$name' requires spark.sql.catalog.$name" +
        ".warehouse"))
  }
  override def name(): String = catalogName

  private def checkSeg(s: String): String = {
    require(s.matches("[A-Za-z0-9_]+"),
      s"txtable catalog identifiers are [A-Za-z0-9_]+ segments, got '$s'")
    s
  }
  private def rootOf(ident: Identifier): String =
    (warehouse +: ident.namespace.toSeq.map(checkSeg) :+
      checkSeg(ident.name)).mkString("/")
  private def isTable(root: String): Boolean =
    new java.io.File(root, "_txlog").isDirectory &&
      TxTable.currentVersion(root) > 0

  private def noSuchTable(ident: Identifier): Nothing =
    throw new org.apache.spark.sql.catalyst.analysis.NoSuchTableException(
      ident)

  override def listTables(namespace: Array[String]): Array[Identifier] = {
    val dir = new java.io.File(
      (warehouse +: namespace.toSeq.map(checkSeg)).mkString("/"))
    Option(dir.listFiles()).toSeq.flatten
      .filter(f => isTable(f.getPath))
      .map(f => Identifier.of(namespace, f.getName)).toArray
  }

  override def loadTable(ident: Identifier): Table = {
    val root = rootOf(ident)
    if (!isTable(root)) noSuchTable(ident)
    val v = TxTable.currentVersion(root)
    val schema = TxTable.inferLogicalSchema(root, v).getOrElse(
      sys.error(s"catalog table $root has no schema-tracking manifest"))
    new TxTableTable(schema, Some(root))
  }

  /** SQL time travel: `VERSION AS OF <v>` — the returned table is
    * pinned to that version's file list, column mapping, AND schema. */
  override def loadTable(ident: Identifier, version: String): Table = {
    val root = rootOf(ident)
    if (!isTable(root)) noSuchTable(ident)
    val v = try version.trim.toInt catch {
      case _: NumberFormatException => throw new IllegalArgumentException(
        s"txtable VERSION AS OF takes a commit number, got '$version'")
    }
    require(TxTable.versions(root).contains(v),
      s"version $v of ${ident.name} is not retained " +
        s"(have: ${TxTable.versions(root).mkString(", ")})")
    val schema = TxTable.inferLogicalSchema(root, v).getOrElse(
      sys.error(s"catalog table $root has no schema-tracking manifest"))
    new TxTableTable(schema, Some(root), Some(v))
  }

  /** SQL `TIMESTAMP AS OF`: micros → the LATEST version whose manifest
    * file was committed at or before that instant — the manifest's
    * mtime IS the commit time (the hardlink lands it once, nothing
    * rewrites it), so timestamp travel needs no format change; Delta
    * maps timestamps to commit-file modification times the same way. */
  override def loadTable(ident: Identifier, timestampMicros: Long)
      : Table = {
    val root = rootOf(ident)
    if (!isTable(root)) noSuchTable(ident)
    val tsMillis = timestampMicros / 1000L
    val vs = TxTable.versions(root)
    val at = vs.filter { v =>
      new java.io.File(s"$root/_txlog/v$v").lastModified() <= tsMillis
    }
    require(at.nonEmpty,
      s"TIMESTAMP AS OF precedes every retained commit of " +
        s"${ident.name} (earliest retained: v${vs.headOption
          .getOrElse(0)})")
    loadTable(ident, at.max.toString)
  }

  override def createTable(ident: Identifier, schema: StructType,
      partitions: Array[Transform], properties: JMap[String, String])
      : Table = {
    require(partitions.isEmpty,
      "txtable catalog CREATE TABLE is unpartitioned; partitioned " +
        "loads go through TxTable.appendPartitioned")
    val root = rootOf(ident)
    if (isTable(root)) throw new org.apache.spark.sql.catalyst.analysis
      .TableAlreadyExistsException(
        (catalogName +: ident.namespace.toSeq :+ ident.name)
          .map(s => s"`$s`").mkString("."))
    TxTable.createEmpty(root, schema): Unit
    new TxTableTable(schema, Some(root))
  }

  override def alterTable(ident: Identifier, changes: TableChange*)
      : Table = sys.error(
    "txtable schema evolution is commit-API surface " +
      "(renameColumn/dropColumn/promoteColumnType/append-merge) — " +
      "ALTER TABLE via the catalog would shadow those semantics")

  override def dropTable(ident: Identifier): Boolean = {
    val root = rootOf(ident)
    if (!isTable(root)) false
    else { graft.Scratch.deleteRec(new java.io.File(root)); true }
  }

  override def renameTable(oldIdent: Identifier, newIdent: Identifier)
      : Unit = {
    if (!isTable(rootOf(oldIdent))) noSuchTable(oldIdent)
    val dst = new java.io.File(rootOf(newIdent))
    dst.getParentFile.mkdirs(): Unit
    java.nio.file.Files.move(
      new java.io.File(rootOf(oldIdent)).toPath, dst.toPath): Unit
  }

  // --- namespaces: directories under the warehouse ------------------
  override def listNamespaces(): Array[Array[String]] =
    Option(new java.io.File(warehouse).listFiles()).toSeq.flatten
      .filter(f => f.isDirectory && !isTable(f.getPath))
      .map(f => Array(f.getName)).toArray
  override def listNamespaces(namespace: Array[String])
      : Array[Array[String]] = Array.empty
  override def namespaceExists(namespace: Array[String]): Boolean =
    namespace.isEmpty || new java.io.File(
      (warehouse +: namespace.toSeq.map(checkSeg)).mkString("/"))
      .isDirectory
  override def loadNamespaceMetadata(namespace: Array[String])
      : JMap[String, String] = {
    if (!namespaceExists(namespace))
      throw new org.apache.spark.sql.catalyst.analysis
        .NoSuchNamespaceException(catalogName +: namespace.toSeq)
    java.util.Collections.emptyMap()
  }
  override def createNamespace(namespace: Array[String],
      metadata: JMap[String, String]): Unit = {
    new java.io.File(
      (warehouse +: namespace.toSeq.map(checkSeg)).mkString("/"))
      .mkdirs(): Unit
  }
  override def alterNamespace(namespace: Array[String],
      changes: org.apache.spark.sql.connector.catalog.NamespaceChange*)
      : Unit = sys.error("txtable namespaces carry no metadata")
  override def dropNamespace(namespace: Array[String], cascade: Boolean)
      : Boolean = {
    val dir = new java.io.File(
      (warehouse +: namespace.toSeq.map(checkSeg)).mkString("/"))
    if (!dir.isDirectory) false
    else {
      require(cascade || Option(dir.list()).forall(_.isEmpty),
        s"namespace ${namespace.mkString(".")} is not empty")
      graft.Scratch.deleteRec(dir); true
    }
  }
}
