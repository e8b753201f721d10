package graft

import org.apache.spark.sql.Row
import org.apache.spark.sql.types._

import graft.operators.Bpe

/**
 * Batched BPE trainer gates (the rounds ≪ merges path):
 *  - batchSize = 1 reduces exactly to the sequential argmax trainer
 *    (the window selection rule with a 1-candidate window IS argmax),
 *  - distributed rounds ≡ the driver-local twin, and the learned
 *    sequence is partition-invariant,
 *  - the disjointness screen drops conflicting candidates (a round
 *    never selects two pairs sharing a symbol),
 *  - SCALE: 1024 merges learned in ≪ 1024 rounds (the VERDICT r13 #4
 *    gate — sequential training would be 1024 driver round-trips).
 */
class BpeBatchedSpec extends SparkSpec {

  private def countsDf(counts: Seq[(String, Long)], parts: Int = 3) = {
    val rows = counts.map { case (w, c) => Row(w, c) }
    spark.createDataFrame(spark.sparkContext.parallelize(rows, parts),
      StructType(Seq(StructField("word", StringType),
        StructField("cnt", LongType))))
  }

  // Sennrich worked-example-style corpus — no abab symbol runs, so the
  // replace-string application and the sequential fold coincide
  private val sennrich = Seq(
    ("low", 5L), ("lower", 2L), ("newest", 6L), ("widest", 3L))

  test("batchSize=1 reduces to the sequential argmax trainer") {
    val batched = Bpe.trainBatchedRounds(countsDf(sennrich),
      numRounds = 8, batchSize = 1, minPairCount = 2L)
    val sequential = Bpe.trainFromCounts(countsDf(sennrich),
      numMerges = 8, minPairCount = 2L)
    assert(batched.merges == sequential)
    assert(batched.rounds == batched.merges.size)
  }

  /** Seeded corpus: enough distinct words over a small alphabet that
    * candidate pairs share symbols heavily (screen exercised) and merge
    * depth is real. */
  private def genCounts(nWords: Int, minLen: Int, maxLen: Int,
                        alphabet: String, seed: Long): Seq[(String, Long)] = {
    val rnd = new scala.util.Random(seed)
    (0 until nWords).map { _ =>
      val len = minLen + rnd.nextInt(maxLen - minLen + 1)
      (Array.fill(len)(alphabet(rnd.nextInt(alphabet.length))).mkString,
        1L + rnd.nextInt(9).toLong)
    }.distinct
  }

  test("distributed rounds == local twin, partition-invariant") {
    val counts = genCounts(300, 6, 12, "abcdef", seed = 7L)
    val local = Bpe.trainBatchedLocal(counts, numRounds = 6,
      batchSize = 16, minPairCount = 2L)
    for (parts <- Seq(1, 4)) {
      val dist = Bpe.trainBatchedRounds(countsDf(counts, parts),
        numRounds = 6, batchSize = 16, minPairCount = 2L)
      assert(dist.merges == local.merges)
      assert(dist.rounds == local.rounds)
    }
    assert(local.merges.size > 6, "rounds must batch more than 1 merge")
  }

  test("a round never selects two pairs sharing a symbol") {
    val counts = genCounts(200, 6, 10, "abcd", seed = 11L)
    // replay locally round by round and inspect each round's batch
    var prevSize = 0
    for (r <- 1 to 5) {
      val upto = Bpe.trainBatchedLocal(counts, numRounds = r,
        batchSize = 16, minPairCount = 2L)
      val round = upto.merges.drop(prevSize)
      // self-pairs like (b,b) are fine; DIFFERENT pairs must not share
      // a symbol
      for (i <- round.indices; j <- round.indices if i < j) {
        val si = Set(round(i)._1, round(i)._2)
        val sj = Set(round(j)._1, round(j)._2)
        assert((si & sj).isEmpty,
          s"round $r selected conflicting pairs ${round(i)} / ${round(j)}")
      }
      prevSize = upto.merges.size
    }
  }

  test("scale: 1024 merges in far fewer than 1024 rounds") {
    val counts = genCounts(800, 10, 16, "abcdefgh", seed = 42L)
    val res = Bpe.trainBatched(countsDf(counts, 4), numMerges = 1024,
      batchSize = 64, minPairCount = 1L)
    assert(res.merges.size == 1024,
      s"corpus exhausted at ${res.merges.size} merges")
    assert(res.rounds <= 128,
      s"expected <= 128 rounds for 1024 merges, got ${res.rounds}")
    // and the batched result is still the deterministic local sequence
    val local = Bpe.trainBatchedLocal(counts, numRounds = res.rounds,
      batchSize = 64, minPairCount = 1L)
    assert(res.merges == local.merges.take(1024))
  }
}
