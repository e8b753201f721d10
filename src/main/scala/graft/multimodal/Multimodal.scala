package graft.multimodal

import org.apache.spark.sql.{Column, DataFrame, Row}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/**
 * Multimodal (image/audio/video) column plumbing for training-data
 * pipelines (BASELINE.json north star; no counterpart in the reference,
 * which is text/CRM only — SURVEY §7.5).
 *
 * Design: media is an opaque `binary` content column plus a typed
 * metadata struct. All Spark-side plumbing — schema, partitioning,
 * per-partition batch shape, explode semantics — is real and tested;
 * only the codec itself is a clearly-marked deterministic STUB (this
 * container ships no image/audio libraries). Swapping `StubCodec` for a
 * real decoder changes no plan shape: the mapPartitions batch path is
 * exactly where a JNI/FFI codec with per-partition init would sit.
 *
 * Scale notes (100 TB): media bytes dominate row width, so (a) never
 * shuffle content — derive features first, then drop/join on id; (b) size
 * `spark.sql.files.maxPartitionBytes` so a partition of blobs fits in
 * executor memory; (c) feature extraction is mapPartitions (init codec
 * once per partition, stream rows) — the Scala analogue of the
 * arrow-batched decode UDF a Python stack would use via mapInPandas.
 */
object Multimodal {

  /** Typed metadata carried alongside the opaque bytes. */
  val metaSchema: StructType = StructType(Seq(
    StructField("kind", StringType),         // image | audio | video
    StructField("width", IntegerType),
    StructField("height", IntegerType),
    StructField("sample_rate", IntegerType),
    StructField("duration_ms", LongType),
    StructField("codec", StringType)))

  val mediaSchema: StructType = StructType(Seq(
    StructField("media_id", LongType, nullable = false),
    StructField("content", BinaryType),
    StructField("meta", metaSchema)))

  /** Deterministic media frame derived from `documents` (text bytes as the
    * opaque payload) — gives every operator real bytes with a replayable
    * oracle, no synthetic RNG (SURVEY §7.4.3). */
  def fromDocuments(docs: DataFrame): DataFrame = {
    val kind = element_at(array(lit("image"), lit("audio"), lit("video")),
      (col("doc_id") % 3 + 1).cast("int"))
    docs.select(
      col("doc_id").as("media_id"),
      col("text").cast("binary").as("content"),
      struct(
        kind.as("kind"),
        (col("doc_id") % 640 + 1).cast("int").as("width"),
        (col("doc_id") % 480 + 1).cast("int").as("height"),
        lit(16000).as("sample_rate"),
        (col("n_chars") * 10).as("duration_ms"),
        lit("stub").as("codec")).as("meta"))
  }

  /** Cheap content descriptors from built-in expressions — byte length,
    * crc32, md5 — the "did the bytes survive the pipeline" audit columns.
    * Pure codegen, no shuffle, computed in the scan stage. */
  def contentFingerprint(content: Column): Seq[(String, Column)] = Seq(
    "n_bytes" -> length(content).cast("long"),
    "crc" -> crc32(content),
    "digest" -> md5(content))

  // ---------------------------------------------------------------------
  // Container-header sniffing — REAL metadata from the bytes, no codec.
  // ---------------------------------------------------------------------
  // Format-header parsing is byte arithmetic, not decoding: these run on
  // genuine PNG/WAV files (spec constructs real headers) entirely inside
  // whole-stage codegen via substring+hex+conv — the cheap first pass a
  // 100 TB media pipeline runs to type/route/filter blobs BEFORE any
  // decode stage touches them.

  /** Big-endian uint from `len` bytes at 1-based offset `off`. */
  private def beUint(content: Column, off: Int, len: Int): Column =
    conv(hex(substring(content, off, len)), 16, 10).cast("long")

  /** Little-endian uint from `len` bytes at 1-based offset `off`. */
  private def leUint(content: Column, off: Int, len: Int): Column =
    (0 until len).map { i =>
      beUint(content, off + i, 1) * (1L << (8 * i))
    }.reduce(_ + _)

  /** True iff the blob starts with the 8-byte PNG signature. */
  def isPng(content: Column): Column =
    hex(substring(content, 1, 8)) === "89504E470D0A1A0A"

  /** PNG width/height from the IHDR chunk (bytes 17-24, big-endian) —
    * struct<width, height>, null for non-PNG bytes. */
  def pngMeta(content: Column): Column =
    when(isPng(content) && length(content) >= 24,
      struct(
        beUint(content, 17, 4).cast("int").as("width"),
        beUint(content, 21, 4).cast("int").as("height")))

  /** True iff the blob is a RIFF/WAVE container. */
  def isWav(content: Column): Column =
    substring(content, 1, 4).cast("string") === "RIFF" &&
      substring(content, 9, 4).cast("string") === "WAVE"

  /** WAV audio format fields from the canonical fmt chunk at offset 13 —
    * struct<channels, sample_rate, bits_per_sample> (little-endian),
    * null for non-WAV bytes. */
  def wavMeta(content: Column): Column =
    when(isWav(content) && length(content) >= 36 &&
        substring(content, 13, 4).cast("string") === "fmt ",
      struct(
        leUint(content, 23, 2).cast("int").as("channels"),
        leUint(content, 25, 4).cast("int").as("sample_rate"),
        leUint(content, 35, 2).cast("int").as("bits_per_sample")))

  /** Route blobs by sniffed container type: image/audio/unknown. */
  def sniffKind(content: Column): Column =
    when(isPng(content), "image/png")
      .when(isWav(content), "audio/wav")
      .otherwise("unknown")

  // ---------------------------------------------------------------------
  // STUB codec — deterministic fake standing in for a real decoder.
  // ---------------------------------------------------------------------

  /** Per-partition "codec" with expensive init amortized across rows —
    * the exact shape a real (JNI/FFI) decoder plugs into. The stub's
    * "decode" is a rolling byte hash; REPLACE `decode` to integrate a
    * real library. */
  private final class StubCodec {
    // real codec: load native lib / allocate decode context here (once
    // per partition, NOT per row)
    def decode(bytes: Array[Byte], dims: Int): Array[Float] = {
      if (bytes == null) return Array.fill(dims)(0.0f)
      val out = new Array[Float](dims)
      var h = 2166136261L.toInt // FNV-1a over bytes, folded per dim
      var i = 0
      while (i < bytes.length) {
        h = (h ^ (bytes(i) & 0xff)) * 16777619
        out(math.abs(i % dims)) += (h & 0xffff) / 65535.0f
        i += 1
      }
      out
    }
  }

  /** Batched feature extraction: binary content → fixed-width float
    * features, decoder initialized once per partition. Output keeps only
    * (media_id, features) — content is dropped BEFORE any downstream
    * shuffle (scale note (a)). */
  def extractFeatures(media: DataFrame, dims: Int = 8): DataFrame = {
    val spark = media.sparkSession
    val inIdx = media.schema.fieldIndex("media_id")
    val cIdx = media.schema.fieldIndex("content")
    val outSchema = StructType(Seq(
      StructField("media_id", LongType, nullable = false),
      StructField("features", ArrayType(FloatType), nullable = false)))
    val encoder = org.apache.spark.sql.catalyst.encoders.RowEncoder
      .encoderFor(outSchema)
    media.mapPartitions { rows =>
      val codec = new StubCodec // per-partition init
      rows.map { r =>
        Row(r.getLong(inIdx), codec.decode(r.getAs[Array[Byte]](cIdx), dims).toSeq)
      }
    }(encoder)
  }

  /** Resize stub: updates the metadata struct and re-stamps the content
    * with a deterministic transformation (byte slice ∝ area ratio) —
    * plumbing-real, pixels-fake. */
  def resizeStub(media: DataFrame, w: Int, h: Int): DataFrame =
    media
      .withColumn("content",
        // fake "resample": keep a prefix proportional to the new area,
        // at least 1 byte — a real impl decodes, resizes, re-encodes
        expr(s"substring(content, 1, greatest(1, cast(floor(length(content) * " +
          s"least(1.0, ($w * $h) / greatest(meta.width * meta.height, 1))) as int)))"))
      .withColumn("meta", struct(
        col("meta.kind"),
        lit(w).as("width"), lit(h).as("height"),
        col("meta.sample_rate"), col("meta.duration_ms"),
        col("meta.codec")))

  /** Frame sampling for video rows: one output row per sampled frame,
    * evenly spaced across duration. posexplode keeps the plan a single
    * Generate — no shuffle; per-frame fingerprint is deterministic. */
  def frameSample(media: DataFrame, nFrames: Int): DataFrame =
    media
      .filter(col("meta.kind") === "video")
      .select(col("media_id"), col("meta.duration_ms").as("duration_ms"),
        posexplode(sequence(lit(0), lit(nFrames - 1))).as(Seq("frame_idx", "_f")))
      .select(
        col("media_id"), col("frame_idx"),
        floor(col("frame_idx") * col("duration_ms") / nFrames).cast("long")
          .as("frame_ts_ms"),
        md5(concat_ws(":", col("media_id"), col("frame_idx")).cast("binary"))
          .as("frame_digest"))
}
