package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import graft.{Q, Tables, sessionKey}

/** Source formats (SURVEY §2.1).
  *
  * q_scan_csv / q_scan_json / q_scan_text / q_scan_xml materialize a
  * copy of a small table in the target format under a scratch dir, then
  * read it back with an explicit schema. The oracle is the original
  * parquet table — so the check verifies Spark's reader+writer
  * round-trip exactly, with no DuckDB-dialect coupling. Small tables
  * only (region/nation/part): at 100 TB these formats are ingest edges,
  * not the storage layout.
  *
  * q_scan_parquet is the real at-scale path: vectorized columnar scan with
  * predicate pushdown + column pruning (ReadSchema restricted to 3 of 11
  * columns, quantity filter reaches the row-group level).
  */
object Sources {

  // run-nonce-keyed (graft.Scratch): concurrent invocations on one
  // machine can never clobber each other's fixtures mid-read
  private def scratch(sub: String): String = graft.Scratch.dir("sources", sub)

  /** Hadoop Configuration is not Serializable; ship it to tasks as a
    * key-value map via broadcast (public API — no private[spark] helpers).
    * Cached per session: bench re-invokes each key several times, and
    * re-serializing + re-broadcasting the full config (hundreds of
    * entries) on every invocation is pure waste (round-8 advice item).
    * The cache is a one-time SNAPSHOT — if the session's Hadoop conf is
    * mutated later (rotated credentials, endpoint change), restart the
    * session (or clear the cache) rather than expecting tasks to see
    * the mutation; broadcasts are immutable by design. */
  private val confCache =
    new java.util.concurrent.ConcurrentHashMap[
      String, org.apache.spark.broadcast.Broadcast[Map[String, String]]]()

  private def broadcastHadoopConf(s: SparkSession)
      : org.apache.spark.broadcast.Broadcast[Map[String, String]] = {
    // entries die with the SparkContext (round-9 advice: static maps
    // keyed by sessionKey otherwise accumulate across session lifecycles)
    graft.SessionCaches.evictOnStop(s, confCache)
    confCache.computeIfAbsent(sessionKey(s), _ => {
      val it = s.sparkContext.hadoopConfiguration.iterator()
      val b = Map.newBuilder[String, String]
      while (it.hasNext) { val e = it.next(); b += (e.getKey -> e.getValue) }
      s.sparkContext.broadcast(b.result())
    })
  }

  /** q_scan_parquet — projection+filter scan of lineitem with pushdown. */
  def qScanParquet(s: SparkSession, dir: String): DataFrame =
    Tables.lineitem(s, dir)
      .filter(col("l_quantity") > 45)
      .select("l_orderkey", "l_linenumber", "l_quantity")
      .orderBy("l_orderkey", "l_linenumber", "l_quantity")

  /** q_scan_csv — region → CSV (header) → read back with explicit schema. */
  def qScanCsv(s: SparkSession, dir: String): DataFrame = {
    val path = scratch(s"csv_${dir.replaceAll("[^a-zA-Z0-9]", "_")}")
    Tables.region(s, dir).coalesce(1)
      .write.mode("overwrite").option("header", "true").csv(path)
    val schema = StructType(Seq(
      StructField("r_regionkey", IntegerType),
      StructField("r_name", StringType)))
    s.read.schema(schema).option("header", "true").csv(path)
      .orderBy("r_regionkey")
  }

  /** q_scan_json — nation → JSON-lines → read back with explicit schema. */
  def qScanJson(s: SparkSession, dir: String): DataFrame = {
    val path = scratch(s"json_${dir.replaceAll("[^a-zA-Z0-9]", "_")}")
    Tables.nation(s, dir).coalesce(1).write.mode("overwrite").json(path)
    val schema = StructType(Seq(
      StructField("n_nationkey", IntegerType),
      StructField("n_name", StringType),
      StructField("n_regionkey", IntegerType)))
    s.read.schema(schema).json(path)
      .select("n_nationkey", "n_name", "n_regionkey")
      .orderBy("n_nationkey")
  }

  /** q_scan_orc — supplier → ORC → read back (the second self-describing
    * columnar format; like parquet it keeps vectorized reads, predicate
    * pushdown, and the int32/int64 physical types — asserted by the oracle
    * hashing against the parquet original). */
  def qScanOrc(s: SparkSession, dir: String): DataFrame = {
    val path = scratch(s"orc_${dir.replaceAll("[^a-zA-Z0-9]", "_")}")
    Tables.supplier(s, dir).coalesce(1).write.mode("overwrite").orc(path)
    s.read.orc(path)
      .select("s_suppkey", "s_name", "s_nationkey", "s_acctbal")
      .orderBy("s_suppkey")
  }

  /** q_scan_xml — part → XML (Spark 4's built-in XML source, the
    * spark-xml connector merged into sql/core) → read back with explicit
    * schema and rowTag. XML is the classic enterprise ingest edge
    * (feeds, exports, config dumps); like CSV/JSON it is a row-oriented
    * text format read here only to prove the round-trip — at 100 TB it
    * is converted to parquet at ingest, never stored. Doubles survive
    * exactly because Java's Double.toString/parse round-trip is
    * lossless, which the oracle's hash against the parquet original
    * verifies. */
  def qScanXml(s: SparkSession, dir: String): DataFrame = {
    val path = scratch(s"xml_${dir.replaceAll("[^a-zA-Z0-9]", "_")}")
    Tables.part(s, dir)
      .select("p_partkey", "p_name", "p_size", "p_retailprice")
      .coalesce(1)
      .write.mode("overwrite").option("rootTag", "parts")
      .option("rowTag", "part").format("xml").save(path)
    val schema = StructType(Seq(
      StructField("p_partkey", LongType),
      StructField("p_name", StringType),
      StructField("p_size", IntegerType),
      StructField("p_retailprice", DoubleType)))
    s.read.schema(schema).option("rowTag", "part").format("xml").load(path)
      .select("p_partkey", "p_name", "p_size", "p_retailprice")
      .orderBy("p_partkey")
  }

  /** q_scan_binary — the `binaryFile` source: the multimodal ingest edge
    * (an image/audio landing bucket read as whole-file rows). Fixture:
    * each document's synthesized payload (its UTF-8 text — the same
    * payload rule as multimodal/Multimodal.scala) is written task-side as
    * its own file; the read back emits per-file metadata + content hash,
    * and the oracle recomputes both from the source table — verifying the
    * file round-trip byte-exactly. At scale the write half doesn't exist
    * (the files ARE the input); the read is one row per file with the
    * content column pruned away unless referenced. */
  def qScanBinary(s: SparkSession, dir: String): DataFrame = {
    import org.apache.hadoop.conf.Configuration
    import org.apache.hadoop.fs.{Path => HPath}
    // fingerprint-keyed (round 13): repeated invocations in one JVM run
    // reuse the fixture instead of delete+rewrite — the write half
    // doesn't exist at scale (the files ARE the input), so re-paying it
    // per invocation only measured fixture IO wobble (the documented
    // 0.7–1.9 s bench band). Bench materializes the fixture once in its
    // untimed warm-up, same treatment as the CBO/bucketed layouts.
    val path = scratch(s"bin_${dir.replaceAll("[^a-zA-Z0-9]", "_")}_" +
      graft.Scratch.fingerprint(dir, "documents"))
    // All fixture I/O goes through the Hadoop FileSystem resolved from the
    // session's configuration — NOT java.io/java.nio: on a distributed
    // cluster task-side java.nio writes land on each executor's LOCAL
    // disk and the subsequent binaryFile read (driver-resolved) would see
    // missing data; the qualified Hadoop path works on any shared FS.
    val hconf = s.sparkContext.hadoopConfiguration
    val root = new HPath(path)
    val fs = root.getFileSystem(hconf)
    val done = new HPath(root, "_GRAFT_DONE")
    val qualified = fs.makeQualified(root).toString
    if (!fs.exists(done)) {
      writeBinaryFixture(s, dir, fs, root, qualified)
      fs.create(done, true).close()
    }
    // pathGlobFilter keeps the done-marker out of the scan
    s.read.format("binaryFile").option("pathGlobFilter", "*.bin")
      .load(qualified)
      .select(
        regexp_extract(col("path"), "doc_(\\d+)\\.bin$", 1).cast("long")
          .as("doc_id"),
        col("length").as("n_bytes"),
        sha2(col("content"), 256).as("payload_sha256"))
      .orderBy("doc_id")
  }

  /** Task-side write of the per-document binary fixture (see
    * [[qScanBinary]] — runs at most once per (data fingerprint, JVM)). */
  private def writeBinaryFixture(s: SparkSession, dir: String,
      fs: org.apache.hadoop.fs.FileSystem,
      root: org.apache.hadoop.fs.Path, qualified: String): Unit = {
    import org.apache.hadoop.conf.Configuration
    import org.apache.hadoop.fs.{Path => HPath}
    fs.delete(root, true) // clean slate (a half-written, marker-less dir)
    fs.mkdirs(root)
    val docs = Tables.documents(s, dir).select("doc_id", "text")
    if (fs.getUri.getScheme == "file") {
      // Local scheme → java.nio fast path (round-8 postmortem: Hadoop's
      // per-file create stack cost 17 s at sf0.1 even with checksums off
      // vs ~2 s via nio; and on a REAL multi-node cluster `file:` would
      // be wrong for the read-back no matter which write API — each
      // executor's local disk — so nio loses no cluster-correctness).
      val localPath = root.toUri.getPath // String: nio Path is not Serializable
      docs.foreachPartition {
        (it: Iterator[org.apache.spark.sql.Row]) =>
          val base = java.nio.file.Paths.get(localPath)
          it.foreach { r =>
            java.nio.file.Files.write(
              base.resolve(f"doc_${r.getLong(0)}%08d.bin"),
              r.getString(1)
                .getBytes(java.nio.charset.StandardCharsets.UTF_8))
          }
      }
    } else {
      // Shared-FS scheme (HDFS/S3A/…): task-side writes through the
      // Hadoop FileSystem so the driver-resolved binaryFile read sees
      // every file. Checksums stay off — they buy nothing on a scratch
      // fixture (the oracle re-hashes content end-to-end) and on
      // ChecksumFileSystem schemes a .crc sidecar would double every
      // create (the round-8 2.2 s → 38.8 s regression).
      val bConf = broadcastHadoopConf(s)
      docs.foreachPartition {
        (it: Iterator[org.apache.spark.sql.Row]) =>
          if (it.hasNext) {
            val c = new Configuration(false)
            bConf.value.foreach { case (k, v) => c.set(k, v) }
            val base = new HPath(qualified)
            // newInstance, NOT getFileSystem: the FileSystem cache keys
            // on (scheme, authority, ugi) only, so the cached instance
            // may be shared with unrelated writers in this executor —
            // mutating ITS checksum flags would disable .crc sidecars
            // for everyone. A private instance scopes the mutation.
            val tfs = org.apache.hadoop.fs.FileSystem
              .newInstance(base.toUri, c)
            try {
              tfs.setWriteChecksum(false)
              tfs.setVerifyChecksum(false)
              it.foreach { r =>
                val out = tfs.create(
                  new HPath(base, f"doc_${r.getLong(0)}%08d.bin"), true)
                try out.write(r.getString(1)
                  .getBytes(java.nio.charset.StandardCharsets.UTF_8))
                finally out.close()
              }
            } finally tfs.close()
          }
      }
    }
  }

  /** q_scan_text — region names → raw text lines → spark.read.text. */
  def qScanText(s: SparkSession, dir: String): DataFrame = {
    val path = scratch(s"text_${dir.replaceAll("[^a-zA-Z0-9]", "_")}")
    Tables.region(s, dir).select(col("r_name")).coalesce(1)
      .write.mode("overwrite").text(path)
    s.read.text(path).orderBy("value")
  }

  val queries: Map[String, Q] = Map(
    "q_scan_parquet" -> (qScanParquet _),
    "q_scan_csv" -> (qScanCsv _),
    "q_scan_json" -> (qScanJson _),
    "q_scan_orc" -> (qScanOrc _),
    "q_scan_xml" -> (qScanXml _),
    "q_scan_text" -> (qScanText _),
    "q_scan_binary" -> (qScanBinary _))

  val oracle: Map[String, String] = Map(
    "q_scan_parquet" ->
      """SELECT l_orderkey, l_linenumber, l_quantity FROM lineitem
        |WHERE l_quantity > 45
        |ORDER BY l_orderkey, l_linenumber, l_quantity""".stripMargin,
    "q_scan_csv" ->
      "SELECT r_regionkey, r_name FROM region ORDER BY r_regionkey",
    "q_scan_json" ->
      """SELECT n_nationkey, n_name, n_regionkey FROM nation
        |ORDER BY n_nationkey""".stripMargin,
    "q_scan_orc" ->
      """SELECT s_suppkey, s_name, s_nationkey, s_acctbal FROM supplier
        |ORDER BY s_suppkey""".stripMargin,
    "q_scan_xml" ->
      """SELECT p_partkey, p_name, p_size, p_retailprice FROM part
        |ORDER BY p_partkey""".stripMargin,
    "q_scan_text" ->
      "SELECT r_name AS value FROM region ORDER BY value",
    "q_scan_binary" ->
      """SELECT doc_id, octet_length(encode(text)) AS n_bytes,
        |  sha256(text) AS payload_sha256
        |FROM documents ORDER BY doc_id""".stripMargin)
}
