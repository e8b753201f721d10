package graft.multimodal

import org.apache.spark.sql.functions._
import graft.SparkSpec

/** Plumbing semantics for the multimodal stubs: schema, per-partition
  * batch extraction, deterministic codec, explode arithmetic. */
class MultimodalSpec extends SparkSpec {
  import spark.implicits._

  private lazy val docs = Seq(
    (0L, "hello world", "en", "web", 11L),
    (1L, "bonjour", "fr", "web", 7L),
    (2L, "video payload bytes", "en", "crawl", 19L)
  ).toDF("doc_id", "text", "lang", "source", "n_chars")

  private lazy val media = Multimodal.fromDocuments(docs)

  test("media frame schema: binary content + typed metadata struct") {
    assert(media.schema("content").dataType.typeName == "binary")
    val meta = media.schema("meta").dataType
      .asInstanceOf[org.apache.spark.sql.types.StructType]
    assert(meta.fieldNames.toSeq ==
      Seq("kind", "width", "height", "sample_rate", "duration_ms", "codec"))
    // kinds cycle deterministically by id
    assert(media.orderBy("media_id").select("meta.kind").as[String]
      .collect().toSeq == Seq("image", "audio", "video"))
  }

  test("header sniffing parses REAL PNG and WAV bytes") {
    // construct a genuine 200x100 PNG header (signature + IHDR) and a
    // genuine 2-channel 44.1kHz 16-bit WAV header (RIFF + fmt chunk)
    def be(v: Int, n: Int): Array[Byte] =
      (n - 1 to 0 by -1).map(i => ((v >> (8 * i)) & 0xFF).toByte).toArray
    def le(v: Int, n: Int): Array[Byte] =
      (0 until n).map(i => ((v >> (8 * i)) & 0xFF).toByte).toArray
    val png = Array[Byte](0x89.toByte, 'P', 'N', 'G', '\r', '\n', 0x1A, '\n') ++
      be(13, 4) ++ "IHDR".getBytes ++ be(200, 4) ++ be(100, 4) ++
      Array[Byte](8, 6, 0, 0, 0)
    val wav = "RIFF".getBytes ++ le(36, 4) ++ "WAVE".getBytes ++
      "fmt ".getBytes ++ le(16, 4) ++ le(1, 2) ++ le(2, 2) ++
      le(44100, 4) ++ le(176400, 4) ++ le(4, 2) ++ le(16, 2)
    val junk = "not a media file".getBytes
    val df = Seq((1L, png), (2L, wav), (3L, junk)).toDF("id", "content")
    val out = df.select(col("id"),
        Multimodal.sniffKind(col("content")).as("kind"),
        Multimodal.pngMeta(col("content")).as("png"),
        Multimodal.wavMeta(col("content")).as("wav"))
      .collect().map(r => r.getLong(0) -> r).toMap
    assert(out(1L).getString(1) === "image/png")
    assert(out(1L).getStruct(2).getInt(0) === 200)   // width
    assert(out(1L).getStruct(2).getInt(1) === 100)   // height
    assert(out(1L).isNullAt(3))
    assert(out(2L).getString(1) === "audio/wav")
    assert(out(2L).getStruct(3).getInt(0) === 2)     // channels
    assert(out(2L).getStruct(3).getInt(1) === 44100) // sample rate
    assert(out(2L).getStruct(3).getInt(2) === 16)    // bits
    assert(out(2L).isNullAt(2))
    assert(out(3L).getString(1) === "unknown")
    assert(out(3L).isNullAt(2) && out(3L).isNullAt(3))
  }

  test("contentFingerprint matches JVM-computed digests") {
    val fp = Multimodal.contentFingerprint(col("content"))
    val row = fp.foldLeft(media.filter(col("media_id") === 0))(
      (d, nc) => d.withColumn(nc._1, nc._2)).head
    val bytes = "hello world".getBytes("UTF-8")
    assert(row.getAs[Long]("n_bytes") == bytes.length)
    val crc = new java.util.zip.CRC32
    crc.update(bytes)
    assert(row.getAs[Long]("crc") == crc.getValue)
    val md = java.security.MessageDigest.getInstance("MD5")
    val hex = md.digest(bytes).map("%02x".format(_)).mkString
    assert(row.getAs[String]("digest") == hex)
  }

  test("extractFeatures: fixed-width, deterministic, repartition-invariant") {
    val f1 = Multimodal.extractFeatures(media, dims = 8)
      .orderBy("media_id").as[(Long, Seq[Float])].collect()
    assert(f1.forall(_._2.length == 8))
    // same bytes → same features regardless of partitioning (per-partition
    // codec init must not leak state across rows)
    val f2 = Multimodal.extractFeatures(media.repartition(3), dims = 8)
      .orderBy("media_id").as[(Long, Seq[Float])].collect()
    assert(f1.toSeq == f2.toSeq)
    // different payloads → different features
    assert(f1(0)._2 != f1(1)._2)
  }

  test("resizeStub updates metadata and shrinks content proportionally") {
    val r = Multimodal.resizeStub(media, 64, 48)
      .filter(col("media_id") === 2) // width 3, height 3 → ratio 1 → full len
      .select(col("meta.width"), col("meta.height"), length(col("content")))
      .head
    assert(r.getInt(0) == 64 && r.getInt(1) == 48)
    assert(r.getInt(2) == "video payload bytes".getBytes("UTF-8").length)
  }

  test("frameSample: only video rows, n frames, evenly spaced") {
    val frames = Multimodal.frameSample(media, 4)
      .orderBy("media_id", "frame_idx").collect()
    assert(frames.length == 4)
    assert(frames.forall(_.getAs[Long]("media_id") == 2L))
    // duration = 19 chars * 10 = 190ms → frames at 0, 47, 95, 142
    assert(frames.map(_.getAs[Long]("frame_ts_ms")).toSeq ==
      Seq(0L, 47L, 95L, 142L))
  }
}
