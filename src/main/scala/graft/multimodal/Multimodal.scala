package graft.multimodal

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.{Q, Tables}

/** Multimodal-column operators: treat media payloads as opaque `binary`
  * columns with typed metadata, and run decode / feature-extract /
  * sampling over them (the brief's training-data-pipeline surface).
  *
  * The harness has no real media files or codec libraries, so the binary
  * payload is synthesized deterministically from `documents.text` (UTF-8
  * bytes) and >>> the DECODE STEP IS A STUB <<< — a deterministic fake
  * (bytes → scaled floats) standing in for a real image/audio decoder.
  * Everything around it is the real at-scale plumbing: binary columns,
  * metadata structs, per-partition batched processing, pruned schemas.
  *
  * Scale notes: payload bytes never shuffle — all three operators are
  * scan-side projections / partition-local iterators; only the small
  * derived metadata would move in a downstream join.
  */
object Multimodal {

  /** Documents with a synthesized binary payload column. */
  private def withPayload(df: DataFrame): DataFrame =
    df.withColumn("payload", col("text").cast("binary"))

  /** q_mm_bytes — binary column + typed metadata: payload size, content
    * hash, and deterministic media-shaped metadata (width/height/channels
    * derived from n_chars; frame count from byte length). */
  def qMmBytes(s: SparkSession, dir: String): DataFrame =
    withPayload(Tables.documents(s, dir))
      .select(col("doc_id"),
        octet_length(col("payload")).as("n_bytes"),
        sha2(col("payload"), 256).as("payload_sha256"),
        (col("n_chars") % 64 + 1).cast("int").as("width"),
        (col("n_chars") / 7 + 1).cast("int").as("height"),
        lit(3).as("channels"),
        (octet_length(col("payload")) / 32 + 1).cast("int").as("n_frames"))
      .orderBy("doc_id")

  /** q_mm_sample — frame/byte sampling: every 16th byte of the payload as
    * a hex token (the shape of sampling frames from a video payload). */
  def qMmSample(s: SparkSession, dir: String): DataFrame =
    withPayload(Tables.documents(s, dir))
      .withColumn("hx", hex(col("payload")))
      .select(col("doc_id"),
        octet_length(col("payload")).as("n_bytes"),
        array_join(expr(
          """transform(sequence(0, octet_length(payload) - 1, 16),
            |          i -> substring(hx, i * 2 + 1, 2))""".stripMargin),
          "-").as("sampled_hex"))
      .orderBy("doc_id")

  /** q_mm_decode — per-partition batched decode returning a fixed-width
    * `array<float>` feature vector per payload. THE DECODER IS A
    * DETERMINISTIC STUB (first 8 payload bytes scaled to [0,1]) — swap
    * `stubDecode` for a real codec; the mapPartitions batching, schema,
    * and ordering are the production shape. No oracle (typed lambda);
    * scalatest asserts determinism and shape. */
  def qMmDecode(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    def stubDecode(bytes: Array[Byte]): Array[Float] = {
      // STUB: stands in for image/audio decoding; deterministic fake.
      val k = 8
      (0 until k).map { i =>
        if (i < bytes.length) (bytes(i) & 0xff) / 255.0f else 0.0f
      }.toArray
    }
    withPayload(Tables.documents(s, dir))
      .select(col("doc_id"), col("payload")).as[(Long, Array[Byte])]
      .mapPartitions { it =>
        // partition-local batch loop: one decoder init per partition
        it.map { case (id, bytes) =>
          // features are a real array<float> (SURVEY §2.13): downstream
          // consumers (ANN, q_dedup_embed) want the typed column
          (id, bytes.length, stubDecode(bytes))
        }
      }
      .toDF("doc_id", "n_bytes", "features")
      .orderBy("doc_id")
  }

  /** Verify-facing projection of [[qMmDecode]]: the driver's no-oracle
    * check pandas-sorts every column, and ndarray cells are unhashable
    * there (proven red in round 6 — the round-6 "q_array_funcs proves
    * arrays survive" claim was wrong: that key emits only scalars DERIVED
    * from arrays). Library callers use qMmDecode (typed array<float>);
    * the registered key stringifies the vector deterministically. */
  private def qMmDecodeVerify(s: SparkSession, dir: String): DataFrame =
    qMmDecode(s, dir).withColumn("features",
      expr("array_join(transform(features, x -> format_string('%.6f', x)), ',')"))

  val queries: Map[String, Q] = Map(
    "q_mm_bytes" -> (qMmBytes _),
    "q_mm_sample" -> (qMmSample _),
    "q_mm_decode" -> (qMmDecodeVerify _))

  val oracle: Map[String, String] = Map(
    "q_mm_bytes" ->
      """SELECT doc_id,
        |  octet_length(text::BLOB) AS n_bytes,
        |  sha256(text) AS payload_sha256,
        |  (n_chars % 64 + 1)::INT AS width,
        |  (n_chars // 7 + 1)::INT AS height,
        |  3 AS channels,
        |  (octet_length(text::BLOB) // 32 + 1)::INT AS n_frames
        |FROM documents ORDER BY doc_id""".stripMargin,
    "q_mm_sample" ->
      """SELECT doc_id,
        |  octet_length(text::BLOB) AS n_bytes,
        |  array_to_string(list_transform(
        |    range(0, octet_length(text::BLOB), 16),
        |    i -> substring(hex(text::BLOB), i * 2 + 1, 2)), '-')
        |    AS sampled_hex
        |FROM documents ORDER BY doc_id""".stripMargin)
}
