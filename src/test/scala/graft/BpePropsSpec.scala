package graft

import org.apache.spark.sql.Row
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import org.scalacheck.Gen

import graft.operators.Bpe

/**
 * Property invariants for the BPE trainer/encoder under generated
 * corpora — the algebra behind the q166 oracle, fuzzed: for ANY word
 * distribution, (1) the localized trainer equals the independent
 * single-node reference, (2) encoding a training word through the
 * lowest-rank-first encoder equals applying the learned merges
 * incrementally (sequential-replay soundness), and (3) encoding is
 * lossless (tokens concatenate back to the word).
 */
class BpePropsSpec extends SparkSpec with PropsCases {

  private def countsDf(counts: Seq[(String, Long)]) = {
    val rows = counts.map { case (w, c) => Row(w, c) }
    spark.createDataFrame(spark.sparkContext.parallelize(rows, 3),
      StructType(Seq(StructField("word", StringType),
        StructField("cnt", LongType))))
  }

  private def refTrain(counts: Seq[(String, Long)], numMerges: Int)
      : Seq[(String, String)] = {
    var vocab = counts.map { case (w, c) =>
      (w.map(String.valueOf(_)).toVector, c) }
    val merges = Seq.newBuilder[(String, String)]
    var done = 0
    var stop = false
    while (done < numMerges && !stop) {
      val pairs = scala.collection.mutable.Map[(String, String), Long]()
      for ((sy, c) <- vocab; i <- 0 until sy.length - 1)
        pairs((sy(i), sy(i + 1))) = pairs.getOrElse((sy(i), sy(i + 1)), 0L) + c
      val cand = pairs.filter(_._2 >= 2L)
      if (cand.isEmpty) stop = true
      else {
        val (a, b) = cand.toSeq.sortBy { case ((x, y), n) => (-n, x, y) }.head._1
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

  private val corpusGen: Gen[Seq[(String, Long)]] = for {
    n <- Gen.choose(4, 14)
    words <- Gen.listOfN(n, for {
      len <- Gen.choose(1, 9)
      cs <- Gen.listOfN(len, Gen.oneOf("abcde".toSeq))
    } yield cs.mkString)
    cnts <- Gen.listOfN(n, Gen.choose(1L, 30L))
  } yield words.distinct.zip(cnts)

  test("trainer == single-node reference for any corpus") {
    cases(corpusGen, 8).foreach { counts =>
      val got = Bpe.trainFromCounts(countsDf(counts), 10)
      assert(got === refTrain(counts, 10), s"corpus: $counts")
    }
  }

  test("encoder == incremental merge application; tokens rebuild the word") {
    import spark.implicits._
    cases(corpusGen, 6).foreach { counts =>
      val merges = Bpe.trainFromCounts(countsDf(counts), 10)
      val words = counts.map(_._1)
      val encoded = words.toDF("w")
        .select(Bpe.encode(col("w"), merges).as("t"))
        .collect().map(_.getSeq[String](0).toSeq)
      // incremental application, round by round (what the q166 oracle's
      // CTE chain replays)
      var vocab = words.map(_.map(String.valueOf(_)).toVector)
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
      assert(encoded === vocab.map(_.toSeq), s"merges: $merges")
      encoded.zip(words).foreach { case (toks, w) =>
        assert(toks.mkString === w, s"lossless rebuild failed for '$w'")
      }
    }
  }
}
