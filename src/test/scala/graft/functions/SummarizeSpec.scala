package graft.functions

import graft.SparkSpec
import org.apache.spark.sql.functions._

class SummarizeSpec extends SparkSpec {
  import spark.implicits._

  private def run(docs: Seq[(Long, String)], span: Int = 3, k: Int = 2) =
    Summarize.lexRankTiles(docs.toDF("doc_id", "text"), col("doc_id"),
        col("text"), spanWords = span, k = k)
      .collect().map(r => r.getAs[Long]("id") ->
        (r.getAs[Long]("n_tiles"), r.getAs[String]("picked"),
          r.getAs[Double]("top_centrality"))).toMap

  test("lexRankTiles picks the tiles sharing the doc's dominant " +
      "vocabulary, re-joined in original order") {
    // span=3: tiles = [a b c] [x y z] [a b d] [p q r]; tiles 0 and 2
    // share {a, b} (jaccard 2/4), everything else is disjoint — the
    // central pair must win over the first-N prefix
    val out = run(Seq((1L, "a b c x y z a b d p q r")))
    val (n, picked, top) = out(1L)
    assert(n === 4L)
    assert(picked === "0,2") // original order, not rank order
    assert(math.abs(top - 0.5) < 1e-9)
  }

  test("no similarity signal degenerates to the first-k tiles (stub " +
      "behavior); single-tile docs keep their one tile") {
    val out = run(Seq(
      (1L, "a b c d e f g h i"), // 3 disjoint tiles → centrality all 0
      (2L, "only two words")))   // 1 tile
    assert(out(1L)._2 === "0,1")
    assert(out(1L)._3 === 0.0)
    assert(out(2L) === ((1L, "0", 0.0)))
  }

  test("centrality ranking is invariant under repartitioning (decimal " +
      "sum discipline)") {
    val docs = (1L to 40L).map(i =>
      i -> (1 to 30).map(w => s"w${(i * 7 + w * w) % 13}").mkString(" "))
    val a = run(docs, span = 5, k = 2)
    val b = Summarize.lexRankTiles(
        docs.toDF("doc_id", "text").repartition(17), col("doc_id"),
        col("text"), spanWords = 5, k = 2)
      .collect().map(r => r.getAs[Long]("id") ->
        (r.getAs[Long]("n_tiles"), r.getAs[String]("picked"),
          r.getAs[Double]("top_centrality"))).toMap
    assert(a === b)
  }
}
