package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.multimodal.Multimodal
import graft.sources.Tables

/**
 * Multimodal plumbing queries over the deterministic media frame derived
 * from `documents` (Multimodal.fromDocuments — text bytes as opaque
 * content). The codec is a stub; everything oracle-checked here is the
 * REAL plumbing: binary byte length, content digests, metadata structs,
 * frame-sampling explode arithmetic. DuckDB side: md5(VARCHAR) hashes
 * UTF-8 bytes = Spark md5(text::binary); octet_length(encode(text))
 * = Spark length(binary).
 */
object MediaQueries {

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(

    "q63_media_fingerprint" -> ((s, dir) => {
      val media = Multimodal.fromDocuments(Tables.load(s, dir, "documents"))
      val fp = Multimodal.contentFingerprint(col("content"))
      fp.foldLeft(media) { case (d, (n, c)) => d.withColumn(n, c) }
        .select(col("media_id"), col("meta.kind").as("kind"),
          col("meta.width").as("width"), col("meta.height").as("height"),
          col("meta.duration_ms").as("duration_ms"),
          col("n_bytes"), col("digest"))
        .orderBy("media_id")
    }),

    "q64_frame_sample" -> ((s, dir) => {
      val media = Multimodal.fromDocuments(Tables.load(s, dir, "documents"))
      Multimodal.frameSample(media, 4).orderBy("media_id", "frame_idx")
    }),

    "q65_resize_plumbing" -> ((s, dir) => {
      val media = Multimodal.fromDocuments(Tables.load(s, dir, "documents"))
      Multimodal.resizeStub(media, 64, 48)
        .select(col("media_id"),
          col("meta.width").as("width"), col("meta.height").as("height"),
          length(col("content")).cast("long").as("n_bytes"))
        .orderBy("media_id")
    })
  )

  /** Shared SQL prelude mirroring Multimodal.fromDocuments. */
  private val mediaSql =
    """media AS (SELECT doc_id AS media_id, text,
      |  ['image','audio','video'][(doc_id % 3) + 1] AS kind,
      |  CAST(doc_id % 640 + 1 AS INT) AS width,
      |  CAST(doc_id % 480 + 1 AS INT) AS height,
      |  n_chars * 10 AS duration_ms
      | FROM documents)""".stripMargin

  val oracleSql: Map[String, String] = Map(

    "q63_media_fingerprint" ->
      s"""WITH $mediaSql
        |SELECT media_id, kind, width, height, duration_ms,
        |  CAST(octet_length(encode(text)) AS BIGINT) AS n_bytes,
        |  md5(text) AS digest
        |FROM media ORDER BY media_id""".stripMargin,

    "q64_frame_sample" ->
      s"""WITH $mediaSql
        |SELECT media_id, f.frame_idx,
        |  CAST(floor(f.frame_idx * duration_ms / 4) AS BIGINT) AS frame_ts_ms,
        |  md5(concat(CAST(media_id AS VARCHAR), ':',
        |    CAST(f.frame_idx AS VARCHAR))) AS frame_digest
        |FROM media, (SELECT unnest(range(4)) AS frame_idx) f
        |WHERE kind = 'video'
        |ORDER BY media_id, frame_idx""".stripMargin,

    "q65_resize_plumbing" ->
      s"""WITH $mediaSql
        |SELECT media_id, CAST(64 AS INT) AS width, CAST(48 AS INT) AS height,
        |  CAST(greatest(1, CAST(floor(octet_length(encode(text)) *
        |    least(1.0, (64.0 * 48.0) / greatest(width * height, 1))) AS INT))
        |    AS BIGINT) AS n_bytes
        |FROM media ORDER BY media_id""".stripMargin
  )
}
