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
  * bytes). For q_mm_decode the payload is a self-describing synthetic
  * image format (GRF1: magic + dims header + interleaved pixel body) and
  * the decoder genuinely parses it — header validation, dim recovery,
  * per-band statistics — standing in for a real image/audio codec.
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

  /** q_mm_frames — frame sampling over a fixed-size-record video column
    * (round 16): raw video is fixed-size frame records (uncompressed
    * YUV/RGB planes), and the training-data op is "keep every K-th
    * frame" — this key does it for real, not as a byte-stride stand-in
    * ([[qMmSample]]): the payload is treated as 48-byte frame records,
    * the kept-frame INDEX SET is computed first (sequence + explode +
    * modulo filter — sample-then-slice, so skipped frames' bytes are
    * never touched), and each kept frame is sliced with binary
    * `substring` and emitted as (frame_idx, length, sha256). Everything
    * is codegen'd scan-side projection — no UDF, no shuffle of payload
    * bytes; at 100 TB the slice offsets become byte-range reads
    * (parquet/object-store range GETs) and the downstream only ever
    * carries the kept frames. The last frame may be short
    * (len % 48) — emitted with its true length, never padded. Oracle:
    * DuckDB recomputes every kept frame's hash by hex-slicing the same
    * blob, so the frame boundaries and bytes are verified exactly. */
  def qMmFrames(s: SparkSession, dir: String): DataFrame = {
    val F = 48 // bytes per frame record
    val K = 3  // keep every K-th frame
    withPayload(Tables.documents(s, dir))
      .select(col("doc_id"), col("payload"),
        octet_length(col("payload")).as("n_bytes"))
      // empty payloads have ZERO frames (not one empty phantom frame),
      // and the sequence STEP generates only the kept indices directly —
      // no per-skipped-frame row ever materializes the payload copy the
      // modulo-filter form paid for
      .filter(col("n_bytes") > 0)
      .select(col("doc_id"), col("n_bytes"), col("payload"),
        explode(expr(
          s"sequence(0, cast((n_bytes - 1) / $F as int), $K)"))
          .as("frame_idx"))
      .select(col("doc_id"), col("frame_idx"),
        least(lit(F), col("n_bytes") - col("frame_idx") * F)
          .cast("int").as("frame_bytes"),
        sha2(expr(s"substring(payload, frame_idx * $F + 1, $F)"), 256)
          .as("frame_sha256"))
      .orderBy("doc_id", "frame_idx")
  }

  /** Deterministic synthetic image format ("GRF1") used by [[qMmDecode]].
    * No real codec library exists in this offline environment, so instead
    * of decoding JPEG/WAV the pipeline encodes and decodes a non-trivial
    * format of our own with the same moving parts a real one has: a
    * binary header (magic, dims, band count) + a row-major interleaved
    * pixel body. The decoder sees ONLY the bytes — it must parse the
    * header to know the shape, exactly like a real image decode.
    *
    * Layout: bytes 0-3 magic 'G','R','F','1'; 4-5 width (BE u16);
    * 6-7 height (BE u16); 8 channels; 9.. width*height*channels pixel
    * bytes (interleaved band-per-byte), synthesized by cycling the
    * document's UTF-8 text bytes. */
  private[graft] object GrfCodec {
    val Magic: Array[Byte] = "GRF1".getBytes("US-ASCII")

    def encode(text: String, width: Int, height: Int, channels: Int)
        : Array[Byte] = {
      // symmetric with decode's validation: silently wrapping a
      // too-large dim into the u16/u8 header would make decode throw a
      // misleading "truncated body" (or divide by a zero channel count)
      require(width >= 1 && width <= 0xffff &&
        height >= 1 && height <= 0xffff &&
        channels >= 1 && channels <= 0xff,
        s"dims out of header range: ${width}x${height}x$channels")
      val src = text.getBytes(java.nio.charset.StandardCharsets.UTF_8)
      val n = width * height * channels
      val out = new Array[Byte](9 + n)
      System.arraycopy(Magic, 0, out, 0, 4)
      out(4) = ((width >> 8) & 0xff).toByte
      out(5) = (width & 0xff).toByte
      out(6) = ((height >> 8) & 0xff).toByte
      out(7) = (height & 0xff).toByte
      out(8) = channels.toByte
      var i = 0
      while (i < n) {
        out(9 + i) = if (src.isEmpty) 0 else src(i % src.length)
        i += 1
      }
      out
    }

    /** Validated header parse: (width, height, channels). Shared by
      * [[decode]] and [[resizeHalf]] so the resize path doesn't pay a
      * full band-stats pass just to learn the dims. */
    private def header(bytes: Array[Byte]): (Int, Int, Int) = {
      require(bytes.length >= 9 &&
        bytes(0) == Magic(0) && bytes(1) == Magic(1) &&
        bytes(2) == Magic(2) && bytes(3) == Magic(3),
        "not a GRF1 payload")
      val width = ((bytes(4) & 0xff) << 8) | (bytes(5) & 0xff)
      val height = ((bytes(6) & 0xff) << 8) | (bytes(7) & 0xff)
      val channels = bytes(8) & 0xff
      // zero dims are unencodable (encode requires ≥1) — reject rather
      // than divide by a zero perBand on a crafted header
      require(width >= 1 && height >= 1 && channels >= 1,
        s"zero GRF1 dim: ${width}x${height}x$channels")
      // length check in Long: the max header dims (65535×65535×255) make
      // width*height*channels overflow Int, and a wrapped-small n could
      // pass an Int compare and yield garbage band means (round-9 advice)
      val nL = width.toLong * height * channels
      require(bytes.length.toLong == 9L + nL, "truncated GRF1 body")
      (width, height, channels)
    }

    /** (width, height, channels, per-band mean of unsigned pixel values). */
    def decode(bytes: Array[Byte]): (Int, Int, Int, Array[Float]) = {
      val (width, height, channels) = header(bytes)
      val n = bytes.length - 9
      val sums = new Array[Long](channels)
      var i = 0
      while (i < n) {
        sums(i % channels) += (bytes(9 + i) & 0xff).toLong
        i += 1
      }
      val perBand = width * height
      (width, height, channels,
        sums.map(sm => (sm.toDouble / perBand).toFloat))
    }

    /** Nearest-neighbor ½× downscale, bytes → bytes: parse the header,
      * sample every second pixel in both axes (band-interleaved layout
      * preserved), re-encode with the new dims. Pure pixel-plumbing —
      * the shape of a real thumbnail/resolution-normalization stage;
      * output pixels are BY CONSTRUCTION a subset of input pixels, which
      * the spec asserts per band. */
    def resizeHalf(bytes: Array[Byte]): Array[Byte] = {
      val (w, h, c) = header(bytes)
      val nw = math.max(1, w / 2)
      val nh = math.max(1, h / 2)
      val out = new Array[Byte](9 + nw * nh * c)
      System.arraycopy(Magic, 0, out, 0, 4)
      out(4) = ((nw >> 8) & 0xff).toByte
      out(5) = (nw & 0xff).toByte
      out(6) = ((nh >> 8) & 0xff).toByte
      out(7) = (nh & 0xff).toByte
      out(8) = c.toByte
      var y = 0
      while (y < nh) {
        var x = 0
        while (x < nw) {
          var b = 0
          while (b < c) {
            // source pixel (2x, 2y), same band; row-major interleaved
            out(9 + (y * nw + x) * c + b) =
              bytes(9 + ((y * 2) * w + x * 2) * c + b)
            b += 1
          }
          x += 1
        }
        y += 1
      }
      out
    }
  }

  /** q_mm_decode — per-partition batched decode of a binary media column.
    * The payload is a synthesized GRF1 image (see [[GrfCodec]]: real
    * header + pixel body — dims are NOT passed alongside, the decoder
    * recovers them from the bytes). The decode stage consumes an actual
    * `binary` column (the encode projection materializes it first, like
    * a landing-bucket ingest would — round-9 advice: the decode key must
    * exercise the binary-column plumbing, not just an in-lambda
    * synthesis), and the mapPartitions batching, typed schema, and
    * ordering are the production shape; swap GrfCodec for a real codec
    * on a cluster with image libs. No oracle (typed lambda); scalatest
    * asserts decoded dims match the synthesis rule per row and
    * run-to-run determinism. */
  def qMmDecode(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    // synthesis rule (bounded dims: ≤ 16×14×3 pixel bytes/doc); the
    // result is a true BinaryType column — the decode below sees ONLY it
    val enc = udf((id: Long, text: String, nChars: Int) =>
      GrfCodec.encode(text,
        width = nChars % 16 + 1,
        height = nChars % 13 + 2,
        channels = if (id % 2 == 0) 3 else 1))
    Tables.documents(s, dir)
      .select(col("doc_id"),
        enc(col("doc_id"), col("text"), col("n_chars").cast("int"))
          .as("payload"))
      .as[(Long, Array[Byte])]
      .mapPartitions { it =>
        // partition-local batch loop: one decoder init per partition
        it.map { case (id, payload) =>
          // decode sees only the payload bytes, like a real image decode
          val (w, h, c, bandMeans) = GrfCodec.decode(payload)
          (id, payload.length, w, h, c, bandMeans)
        }
      }
      .toDF("doc_id", "n_bytes", "width", "height", "channels",
        "band_means")
      .orderBy("doc_id")
  }

  /** q_mm_resize — binary-to-binary media transform (round 10): the
    * `resize` stage of the brief's decode / feature-extract / resize /
    * frame-sample enumeration. Each doc's GRF1 payload is ½×-downscaled
    * by nearest-neighbor INSIDE the binary domain (header parse → pixel
    * subsample → re-encode; the lambda never sees decoded floats), and
    * the key emits the before/after dims + byte sizes + the sha256 of
    * the resized payload — the manifest a thumbnail/normalization stage
    * writes. Payload bytes never shuffle: encode, resize, and hash are
    * one scan-side partition-local pass; only the tiny metadata row
    * leaves the task. No oracle (typed lambda over a binary column);
    * ApproxSpec asserts dims halve per row, output pixels are a subset
    * of input pixels per band, the resized payload re-decodes cleanly,
    * and run-to-run determinism. */
  def qMmResize(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val enc = udf((id: Long, text: String, nChars: Int) =>
      GrfCodec.encode(text,
        width = nChars % 16 + 1,
        height = nChars % 13 + 2,
        channels = if (id % 2 == 0) 3 else 1))
    Tables.documents(s, dir)
      .select(col("doc_id"),
        enc(col("doc_id"), col("text"), col("n_chars").cast("int"))
          .as("payload"))
      .as[(Long, Array[Byte])]
      .mapPartitions { it =>
        it.map { case (id, payload) =>
          val resized = GrfCodec.resizeHalf(payload)
          val (w, h, c, _) = GrfCodec.decode(payload)
          val (nw, nh, _, _) = GrfCodec.decode(resized)
          val sha = java.security.MessageDigest.getInstance("SHA-256")
            .digest(resized).map(b => f"${b & 0xff}%02x").mkString
          (id, w, h, nw, nh, c, payload.length, resized.length, sha)
        }
      }
      .toDF("doc_id", "width", "height", "new_width", "new_height",
        "channels", "n_bytes_in", "n_bytes_out", "resized_sha256")
      .orderBy("doc_id")
  }

  /** Verify-facing projection of [[qMmDecode]]: the driver's no-oracle
    * check pandas-sorts every column, and ndarray cells are unhashable
    * there (proven red in round 6 — the round-6 "q_array_funcs proves
    * arrays survive" claim was wrong: that key emits only scalars DERIVED
    * from arrays). Library callers use qMmDecode (typed array<float>);
    * the registered key stringifies the vector deterministically. */
  private def qMmDecodeVerify(s: SparkSession, dir: String): DataFrame =
    qMmDecode(s, dir).withColumn("band_means",
      expr("array_join(transform(band_means, x -> format_string('%.4f', x)), ',')"))

  val queries: Map[String, Q] = Map(
    "q_mm_bytes" -> (qMmBytes _),
    "q_mm_sample" -> (qMmSample _),
    "q_mm_frames" -> (qMmFrames _),
    "q_mm_decode" -> (qMmDecodeVerify _),
    "q_mm_resize" -> (qMmResize _))

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
    // Oracle notes: (a) the 0..255 series bound is a CONSTANT because
    // DuckDB 1.0 allows neither lateral column args nor subqueries in
    // table functions — it covers 12 KB payloads (harness docs max
    // ~0.6 KB, 20x margin) and a doc ever exceeding it fails the hash
    // gate LOUDLY (missing oracle rows); (b) DuckDB 1.0's sha256 only
    // takes VARCHAR, so the oracle hashes the CHARACTER substring —
    // byte-identical to Spark's binary slice because the corpus is
    // ASCII (octet_length == length, asserted by the same hash gate:
    // any non-ASCII doc would shift the byte boundaries and mismatch)
    "q_mm_frames" ->
      """SELECT doc_id, i AS frame_idx,
        |  least(48, octet_length(text::BLOB) - i * 48)::INT AS frame_bytes,
        |  sha256(substring(text, i * 48 + 1, 48)) AS frame_sha256
        |FROM documents, generate_series(0, 255, 3) AS t(i)
        |WHERE octet_length(text::BLOB) > 0
        |  AND i <= (octet_length(text::BLOB) - 1) // 48
        |ORDER BY doc_id, frame_idx""".stripMargin,
    "q_mm_sample" ->
      """SELECT doc_id,
        |  octet_length(text::BLOB) AS n_bytes,
        |  array_to_string(list_transform(
        |    range(0, octet_length(text::BLOB), 16),
        |    i -> substring(hex(text::BLOB), i * 2 + 1, 2)), '-')
        |    AS sampled_hex
        |FROM documents ORDER BY doc_id""".stripMargin)
}
