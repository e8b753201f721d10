package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

class SimilaritySearchSpec extends SparkSpec {
  import spark.implicits._

  private val embs = Seq(
    (1L, Array(1.0f, 0.0f, 0.0f), 0),
    (2L, Array(0.9f, 0.1f, 0.0f), 0),
    (3L, Array(0.0f, 1.0f, 0.0f), 0),
    (4L, Array(0.0f, 0.0f, 1.0f), 1),
    (5L, Array(0.1f, 0.0f, 0.9f), 1)
  ).toDF("vec_id", "embedding", "label")

  test("bruteForceTopK returns exact cosine ranking") {
    val out = SimilaritySearch.bruteForceTopK(embs, col("vec_id"),
      col("embedding"), Seq(1.0, 0.0, 0.0), 3).orderBy("rank").collect()
    assert(out.map(_.getLong(0)).toSeq == Seq(1L, 2L, 5L))
    assert(out.head.getDouble(1) == 1.0)
  }

  test("lshTopK agrees with brute force when buckets align (self-query)") {
    val q = Seq(1.0, 0.0, 0.0)
    val brute = SimilaritySearch.bruteForceTopK(embs, col("vec_id"),
      col("embedding"), q, 1).head.getLong(0)
    val ann = SimilaritySearch.lshTopK(embs, col("vec_id"), col("embedding"),
      q, dims = 3, planes = 2, k = 1).collect()
    // the true NN shares the query's bucket by construction here
    assert(ann.nonEmpty && ann.head.getLong(0) == brute)
  }

  test("lshBuckets is deterministic and stable across invocations") {
    val b1 = SimilaritySearch.lshBuckets(embs, col("vec_id"), col("embedding"), 3, 4)
      .select("id", "bucket").collect().map(r => r.getLong(0) -> r.getInt(1)).toMap
    val b2 = SimilaritySearch.lshBuckets(embs, col("vec_id"), col("embedding"), 3, 4)
      .select("id", "bucket").collect().map(r => r.getLong(0) -> r.getInt(1)).toMap
    assert(b1 == b2)
    // near-identical vectors land in the same bucket
    assert(b1(1L) == b1(2L))
    assert(b1(4L) == b1(5L))
  }

  test("ivfTopKFromIndex on a parquet-roundtripped index equals the " +
      "inline-build ivfTopK") {
    // modulus=2 → centroids from ids 2 and 4; probe both lists so every
    // assigned vector is searchable and the comparison is total
    val q = Seq(1.0, 0.0, 0.0)
    def rows(df: org.apache.spark.sql.DataFrame) = df
      .select("id", "cosine", "rank").collect()
      .map(r => (r.getLong(0), math.round(r.getDouble(1) * 1e9), r.getInt(2)))
      .toSeq.sortBy(_._3)
    val inline = rows(SimilaritySearch.ivfTopK(embs, col("vec_id"),
      col("embedding"), q, modulus = 2, nprobe = 2, k = 5))
    assert(inline.nonEmpty)
    val idx = SimilaritySearch.ivfIndex(embs, col("vec_id"),
      col("embedding"), modulus = 2)
    val dir = java.nio.file.Files.createTempDirectory("ivfidx").toString
    idx.centroids.write.mode("overwrite").parquet(s"$dir/c")
    idx.assignments.write.mode("overwrite").parquet(s"$dir/a")
    val stored = SimilaritySearch.IvfIndex(
      spark.read.parquet(s"$dir/c"), spark.read.parquet(s"$dir/a"))
    assert(rows(SimilaritySearch.ivfTopKFromIndex(embs, col("vec_id"),
      col("embedding"), stored, q, nprobe = 2, k = 5)) === inline)
  }

  test("ivfAppend: delta-assigned index is bit-identical to a full " +
      "rebuild when the centroid set is unchanged; centroids held fixed") {
    // centroids from even ids; the delta (ids 3, 5) adds no multiples of
    // 2, so rebuild centroids == stored centroids and the appended index
    // must equal the full build exactly
    val corpus = embs.filter(col("vec_id") % 2 === 0 || col("vec_id") === 1L)
    val delta = embs.filter(col("vec_id") === 3L || col("vec_id") === 5L)
    val storedIdx = SimilaritySearch.ivfIndex(corpus, col("vec_id"),
      col("embedding"), modulus = 2)
    val appended = SimilaritySearch.ivfAppend(storedIdx, delta,
      col("vec_id"), col("embedding"))
    val rebuilt = SimilaritySearch.ivfIndex(embs, col("vec_id"),
      col("embedding"), modulus = 2)
    def assignRows(df: org.apache.spark.sql.DataFrame) = df.collect()
      .map(r => (r.getLong(0), r.getLong(1), math.round(r.getDouble(2) * 1e9)))
      .toSet
    assert(assignRows(appended.assignments) === assignRows(rebuilt.assignments))
    assert(appended.centroids.select("cid").collect().map(_.getLong(0)).toSet ===
      rebuilt.centroids.select("cid").collect().map(_.getLong(0)).toSet)
    // and the corpus side was never re-assigned: stored assignment rows
    // appear untouched in the appended table
    assert(assignRows(storedIdx.assignments).subsetOf(
      assignRows(appended.assignments)))
  }

  test("knnWithinBlock ranks neighbors per item within label") {
    val out = SimilaritySearch.knnWithinBlock(embs, col("vec_id"),
      col("embedding"), col("label"), 1).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(out(1L) == 2L) // 1's nearest in label 0 is 2
    assert(out(4L) == 5L)
    assert(out(5L) == 4L)
  }
}
