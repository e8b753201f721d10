package graft

import org.apache.spark.sql.Row
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import graft.operators.Bpe

/**
 * BPE trainer + encoder gates:
 *  - trainer vs an independent single-node reference implementation
 *    (classic Sennrich worked example + a generated corpus),
 *  - partition-invariance of the learned merge sequence,
 *  - encoder (BpeEncode, lowest-rank-first fixpoint) agrees with the
 *    trainer's incremental vocab — the q166 oracle's soundness property,
 *  - code-point discipline for supplementary characters.
 */
class BpeSpec extends SparkSpec {

  private def countsDf(counts: Seq[(String, Long)]) = {
    val rows = counts.map { case (w, c) => Row(w, c) }
    spark.createDataFrame(spark.sparkContext.parallelize(rows, 3),
      StructType(Seq(StructField("word", StringType),
        StructField("cnt", LongType))))
  }

  /** Independent single-node reference: code-point split, pair counts
    * weighted by word count (every adjacent position), argmax with
    * (n desc, a asc, b asc) tiebreak, single-pass left-to-right merge. */
  private def refTrain(counts: Seq[(String, Long)], numMerges: Int,
                       minPair: Long): Seq[(String, String)] = {
    def splitCp(w: String): Vector[String] = {
      val out = Vector.newBuilder[String]
      var off = 0
      while (off < w.length) {
        val next = w.offsetByCodePoints(off, 1)
        out += w.substring(off, next); off = next
      }
      out.result()
    }
    var vocab = counts.map { case (w, c) => (splitCp(w), c) }
    val merges = Seq.newBuilder[(String, String)]
    var done = 0
    var exhausted = false
    while (done < numMerges && !exhausted) {
      val pairs = scala.collection.mutable.Map[(String, String), Long]()
      for ((sy, c) <- vocab; i <- 0 until sy.length - 1)
        pairs((sy(i), sy(i + 1))) = pairs.getOrElse((sy(i), sy(i + 1)), 0L) + c
      val cand = pairs.filter(_._2 >= minPair)
      if (cand.isEmpty) exhausted = true
      else {
        val (a, b) = cand.toSeq
          .sortBy { case ((x, y), n) => (-n, x, y) }.head._1
        merges += ((a, b))
        vocab = vocab.map { case (sy, c) =>
          val out = Vector.newBuilder[String]
          var i = 0
          while (i < sy.length) {
            if (i < sy.length - 1 && sy(i) == a && sy(i + 1) == b) {
              out += a + b; i += 2
            } else { out += sy(i); i += 1 }
          }
          (out.result(), c)
        }
        done += 1
      }
    }
    merges.result()
  }

  private def encodeAll(words: Seq[String],
                        merges: Seq[(String, String)]): Seq[Seq[String]] = {
    import spark.implicits._
    words.toDF("w").select(Bpe.encode(col("w"), merges).as("t"))
      .collect().map(_.getSeq[String](0).toSeq).toSeq
  }

  test("trainer reproduces the classic worked example") {
    // Sennrich et al. 2016 §3 shape: (e,s) wins the 9-9 tie vs (s,t) on
    // the a-asc tiebreak, then (es,t) merges the freshly created symbol.
    val counts = Seq[(String, Long)](
      ("low", 5), ("lower", 2), ("newest", 6), ("widest", 3))
    val got = Bpe.trainFromCounts(countsDf(counts), 4)
    assert(got.take(2) === Seq(("e", "s"), ("es", "t")))
    assert(got === refTrain(counts, 4, 2))
  }

  test("trainer matches reference on a generated corpus, any partitioning") {
    val rnd = new scala.util.Random(7)
    val words = Seq("alpha", "alpine", "alto", "beta", "betamax", "delta",
      "dealt", "gamma", "gamut", "magma", "sigma", "stigma")
    val counts = words.map(w => (w, (rnd.nextInt(40) + 1).toLong))
    val expect = refTrain(counts, 12, 2)
    assert(Bpe.trainFromCounts(countsDf(counts), 12) === expect)
    assert(Bpe.trainFromCounts(countsDf(counts).repartition(7), 12) === expect)
    assert(Bpe.trainFromCounts(countsDf(counts).coalesce(1), 12) === expect)
  }

  test("adaptive localization: driver-local path ≡ distributed rounds") {
    val rnd = new scala.util.Random(13)
    val words = Seq("spark", "sparse", "parse", "parquet", "partition",
      "spartan", "park", "part", "apart", "depart")
    val counts = words.map(w => (w, (rnd.nextInt(25) + 1).toLong))
    val df = countsDf(counts)
    val local = Bpe.trainFromCounts(df, 10)                    // localizes
    val dist = Bpe.trainFromCounts(df, 10, localizeBelow = 0L) // forced rounds
    assert(local === dist)
    assert(local === refTrain(counts, 10, 2))
  }

  test("localizeBelow at/above Int.MaxValue is clamped, not overflowed") {
    // pre-r14 this overflowed limit() to a negative value and failed at
    // runtime; the clamp makes any huge threshold mean "always localize"
    val counts = Seq[(String, Long)](("low", 5), ("newest", 6))
    val got = Bpe.trainFromCounts(countsDf(counts), 2,
      localizeBelow = Long.MaxValue)
    assert(got === refTrain(counts, 2, 2))
  }

  test("trainer early-stops below minPairCount") {
    // every pair unique at cnt=1 → no merge clears minPairCount=2
    val got = Bpe.trainFromCounts(countsDf(Seq(("abc", 1), ("def", 1))), 5)
    assert(got === Seq.empty)
  }

  test("encoder applies lowest-rank-first to fixpoint") {
    val merges = Seq(("e", "s"), ("es", "t"), ("l", "o"), ("lo", "w"))
    val got = encodeAll(Seq("newest lowest low", "", "   ", "LOW"), merges)
    assert(got(0) === Seq("n", "e", "w", "est", "low", "est", "low"))
    assert(got(1) === Seq.empty)
    assert(got(2) === Seq.empty)
    assert(got(3) === Seq("low")) // lowercased before split
  }

  test("encoder agrees with trainer's incremental vocab (q166 soundness)") {
    // the property the generated DuckDB oracle relies on: tokenizing a
    // training word through BpeEncode equals the final trainer vocab row
    val counts = Seq[(String, Long)](
      ("scan", 9), ("scans", 4), ("span", 6), ("spans", 3), ("plan", 8),
      ("plans", 5), ("clan", 2), ("scant", 2), ("planet", 3))
    val merges = Bpe.trainFromCounts(countsDf(counts), 10)
    assert(merges.nonEmpty)
    // reference incremental application (same single-pass merge per round)
    val ref = refTrain(counts, 10, 2)
    assert(merges === ref)
    val viaEncoder = encodeAll(counts.map(_._1), merges)
    val viaTrainerVocab = {
      var vocab = counts.map { case (w, _) =>
        w.map(String.valueOf(_)).toVector }
      for ((a, b) <- merges) vocab = vocab.map { sy =>
        val out = Vector.newBuilder[String]
        var i = 0
        while (i < sy.length) {
          if (i < sy.length - 1 && sy(i) == a && sy(i + 1) == b) {
            out += a + b; i += 2
          } else { out += sy(i); i += 1 }
        }
        out.result()
      }
      vocab
    }
    assert(viaEncoder === viaTrainerVocab.map(_.toSeq))
  }

  test("supplementary characters: trainer and encoder agree on code points") {
    val clef = new String(Character.toChars(0x1D11E)) // 𝄞, outside the BMP
    val word = s"${clef}a${clef}a"
    val counts = Seq((word, 5L))
    val merges = Bpe.trainFromCounts(countsDf(counts), 2)
    assert(merges === refTrain(counts, 2, 2)) // (𝄞, a) then (𝄞a, 𝄞a)
    assert(merges.head === ((clef, "a")))
    val toks = encodeAll(Seq(word), merges).head
    assert(toks.mkString === word) // no unpaired surrogates, lossless
    assert(toks === Seq(clef + "a" + clef + "a"))
  }
}
