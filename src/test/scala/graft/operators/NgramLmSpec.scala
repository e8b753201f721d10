package graft.operators

import org.apache.spark.sql.functions._

import graft.SparkSpec

/**
 * Bigram-LM gates: hand-computed smoothed probabilities on a tiny
 * corpus, unseen-event floors, artifact additivity (the mergeable-count
 * contract), partition invariance of the decimal-summed score, and
 * empty-document semantics.
 */
class NgramLmSpec extends SparkSpec {

  import spark.implicits._

  private def docsDf(rows: Seq[(Long, String)]) =
    rows.toDF("doc_id", "text").repartition(3)

  test("counts match hand enumeration, tokenization lowers and trims") {
    val docs = docsDf(Seq((1L, "The cat  sat"), (2L, "the cat ran")))
    val uni = NgramLm.unigramCounts(docs, col("text"))
      .collect().map(r => (r.getString(0), r.getLong(1))).toMap
    assert(uni === Map("the" -> 2L, "cat" -> 2L, "sat" -> 1L, "ran" -> 1L))
    val bi = NgramLm.bigramCounts(docs, col("text"))
      .collect().map(r => ((r.getString(0), r.getString(1)), r.getLong(2))).toMap
    assert(bi === Map(("the", "cat") -> 2L, ("cat", "sat") -> 1L,
      ("cat", "ran") -> 1L))
  }

  test("scoreNll reproduces hand-computed add-k arithmetic") {
    val docs = docsDf(Seq((1L, "the cat sat"), (2L, "the cat ran")))
    val uni = NgramLm.unigramCounts(docs, col("text"))
    val bi = NgramLm.bigramCounts(docs, col("text"))
    val got = NgramLm.scoreNll(docs, col("doc_id"), col("text"), uni, bi, 0.5)
      .collect().map(r => (r.getLong(0), (r.getInt(1), r.getDouble(2)))).toMap
    // V=4, N=6, k=0.5: P(the)=(2+.5)/(6+2)=.3125,
    // P(cat|the)=(2+.5)/(2+2)=.625, P(sat|cat)=P(ran|cat)=(1+.5)/(2+2)=.375
    val expect = -(math.log(0.3125) + math.log(0.625) + math.log(0.375)) / 3.0
    assert(got(1L)._1 === 3)
    assert(math.abs(got(1L)._2 - expect) < 1e-12)
    assert(math.abs(got(2L)._2 - expect) < 1e-12) // symmetric corpus
  }

  test("unseen tokens and bigrams hit the smoothed floor, never -inf") {
    val train = docsDf(Seq((1L, "a b a b")))
    val uni = NgramLm.unigramCounts(train, col("text"))
    val bi = NgramLm.bigramCounts(train, col("text"))
    val got = NgramLm.scoreNll(docsDf(Seq((9L, "z z"))), col("doc_id"),
      col("text"), uni, bi, 0.5).collect().head
    // V=2, N=4: P(z)=.5/(4+1)=.1, P(z|z)=.5/(0+1)=.5 (unseen prev → kV)
    val expect = -(math.log(0.1) + math.log(0.5)) / 2.0
    assert(math.abs(got.getDouble(2) - expect) < 1e-12)
  }

  test("artifacts are additive: shard-merge equals whole-corpus counts") {
    val a = docsDf(Seq((1L, "x y z"), (2L, "y z")))
    val b = docsDf(Seq((3L, "x y x y")))
    val whole = docsDf(Seq((1L, "x y z"), (2L, "y z"), (3L, "x y x y")))
    val merged = NgramLm.bigramCounts(a, col("text"))
      .union(NgramLm.bigramCounts(b, col("text")))
      .groupBy("t1", "t2").agg(sum("cnt").as("cnt"))
    val direct = NgramLm.bigramCounts(whole, col("text"))
    assert(merged.except(direct).isEmpty && direct.except(merged).isEmpty)
  }

  test("score is partition-invariant (decimal-exact term sum)") {
    val rnd = new scala.util.Random(11)
    val vocab = Vector("a", "b", "c", "d", "e", "f")
    val docs = (1L to 40L).map(i =>
      (i, Seq.fill(rnd.nextInt(30) + 5)(vocab(rnd.nextInt(6))).mkString(" ")))
    val d1 = docsDf(docs).repartition(1)
    val d7 = docsDf(docs).repartition(7)
    val uni = NgramLm.unigramCounts(d1, col("text"))
    val bi = NgramLm.bigramCounts(d1, col("text"))
    def run(d: org.apache.spark.sql.DataFrame) =
      NgramLm.scoreNll(d, col("doc_id"), col("text"), uni, bi)
        .collect().map(r => (r.getLong(0), r.getDouble(2))).toMap
    assert(run(d1) === run(d7)) // bit-exact, not approximate
  }

  test("token-less documents score NULL, not zero") {
    val train = docsDf(Seq((1L, "a b")))
    val uni = NgramLm.unigramCounts(train, col("text"))
    val bi = NgramLm.bigramCounts(train, col("text"))
    val got = NgramLm.scoreNll(docsDf(Seq((5L, "   "))), col("doc_id"),
      col("text"), uni, bi).collect().head
    assert(got.getInt(1) === 0)
    assert(got.isNullAt(2))
  }
}
