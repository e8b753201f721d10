package graft.streaming

import java.nio.file.Files

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

import graft.SparkSpec
import graft.operators.SimilaritySearch
import graft.sources.Tables

/** Streaming IVF maintenance: the streamed index must equal the batch
  * `ivfAppend` result, batch replay must not duplicate, and search
  * through the streamed index must match the batch path row-for-row. */
class IvfStreamSpec extends SparkSpec {
  import spark.implicits._

  test("streamed delta ingest ≡ batch ivfAppend; replay-safe; search parity") {
    val embs = Tables.load(spark, "/root/testdata/sf0.001", "embeddings")
    val base = embs.filter(col("vec_id") % 2 === 0)
    val delta = embs.filter(col("vec_id") % 2 === 1)
    val idx = SimilaritySearch.ivfIndex(base, col("vec_id"),
      col("embedding"), 50)
    val dir = Files.createTempDirectory("graft-ivf-stream").toString + "/index"
    Streams.writeIvfIndex(idx, dir)

    // stream the delta in two micro-batches
    val rows = delta.select("vec_id", "embedding").collect()
      .map(r => (r.getLong(0), r.getSeq[Float](1).toArray))
    val (b1, b2) = rows.splitAt(rows.length / 2)
    val mem = MemoryStream[(Long, Array[Float])](spark)
    val q = mem.toDF.toDF("vec_id", "embedding").writeStream
      .foreachBatch(Streams.ivfAppendBatchWriter(dir))
      .option("checkpointLocation",
        Files.createTempDirectory("graft-ivf-ckpt").toString)
      .start()
    mem.addData(b1.toIndexedSeq)
    q.processAllAvailable()
    mem.addData(b2.toIndexedSeq)
    q.processAllAvailable()
    q.stop()

    // at-least-once replay of batch 0: overwrites its own generation,
    // never duplicates
    Streams.ivfAppendBatchWriter(dir)(
      spark.createDataset(b1.toIndexedSeq).toDF("vec_id", "embedding"), 0L)

    val streamed = Streams.readIvfIndex(spark, dir)
    val batchIdx = SimilaritySearch.ivfAppend(idx, delta, col("vec_id"),
      col("embedding"))
    assert(streamed.assignments.count() === batchIdx.assignments.count(),
      "replay or batching must not change the assignment row count")
    val sA = streamed.assignments.select("id", "cid")
    val bA = batchIdx.assignments.select("id", "cid")
    assert(sA.except(bA).isEmpty && bA.except(sA).isEmpty,
      "streamed assignments must equal the batch ivfAppend assignments")

    // search parity through the stored index (the q134 protocol)
    val qv = embs.filter(col("vec_id") === 1).select("embedding")
      .head.getSeq[Float](0).map(_.toDouble)
    def top(ix: SimilaritySearch.IvfIndex) =
      SimilaritySearch.ivfTopKFromIndex(embs, col("vec_id"),
        col("embedding"), ix, qv, nprobe = 2, k = 10)
        .select("id").as[Long].collect().toSeq
    assert(top(streamed) === top(batchIdx),
      "top-k through the streamed index must match the batch path")

    // a base REBUILD is a new corpus version: generations streamed
    // against the old centroids must not survive partition discovery
    val rebuilt = SimilaritySearch.ivfIndex(embs, col("vec_id"),
      col("embedding"), 50)
    Streams.writeIvfIndex(rebuilt, dir)
    val reread = Streams.readIvfIndex(spark, dir)
    assert(reread.assignments.count() === rebuilt.assignments.count(),
      "stale streamed generations must be cleared by a base rebuild")
  }
}
