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
