package graft.operators

import org.apache.spark.sql.functions._
import org.scalacheck.Gen

import graft.{PropsCases, SparkSpec}

/** Property invariants for the corpus/event operators under generated
  * inputs — the algebra that must hold for ANY data, complementing the
  * fixed-value oracles. Raw ScalaCheck generators with fixed seeds (no
  * scalatest bridge in the offline dep set); few, fat cases — each case
  * spins Spark jobs. */
class CorpusPropsSpec extends SparkSpec with PropsCases {

  private lazy val s = spark
  import s.implicits._

  test("funnel: stage counts are monotonically non-increasing for any event set") {
    val evGen = Gen.listOfN(60, for {
      u <- Gen.choose(1L, 8L)
      minute <- Gen.choose(0, 2000)
      ty <- Gen.oneOf("view", "click", "purchase", "noise")
    } yield (u, new java.sql.Timestamp(1700000000000L + minute * 60000L), ty))
    cases(evGen, 5).foreach { rows =>
      val df = rows.toDF("user_id", "ts", "event_type")
      val counts = EventAnalytics.funnel(df, col("user_id"), col("ts"),
          col("event_type"), Seq("view", "click", "purchase"))
        .orderBy("stage").collect().map(_.getLong(1))
      assert(counts.length === 3)
      assert(counts(0) >= counts(1) && counts(1) >= counts(2),
        s"funnel must narrow: ${counts.mkString(",")}")
    }
  }

  test("packSequences: offsets in [0, capacity), spans ordered, mass conserved") {
    val docGen = Gen.listOfN(30, for {
      id <- Gen.choose(1L, 1000L)
      shard <- Gen.oneOf("a", "b")
      n <- Gen.choose(1L, 400L)
    } yield (id, shard, n))
    cases(docGen, 5).foreach { rows =>
      val distinctRows = rows.groupBy(_._1).map(_._2.head).toSeq
      val df = distinctRows.toDF("doc_id", "shard", "n_tok")
      val out = Corpus.packSequences(df, col("doc_id"), col("shard"),
        col("n_tok"), capacity = 128).collect()
      out.foreach { r =>
        assert(r.getLong(5) >= 0 && r.getLong(5) < 128)       // offset
        assert(r.getLong(4) >= r.getLong(3))                  // last >= first
      }
      assert(out.map(_.getLong(2)).sum === distinctRows.map(_._3).sum)
    }
  }

  test("orderStatEdges: distributed selection equals direct rank " +
      "arithmetic for any values/k (ties, nulls, tiny n)") {
    val gen = for {
      n <- Gen.choose(0, 60)
      // coarse values force ties; nulls interleaved
      vs <- Gen.listOfN(n, Gen.option(Gen.choose(0, 9).map(_.toDouble)))
      k <- Gen.choose(2, 7)
    } yield (vs, k)
    cases(gen, 12).foreach { case (vs, k) =>
      val df = vs.zipWithIndex.map { case (v, i) => (i.toLong, v) }
        .toDF("id", "v")
      val got = RobustStats.orderStatEdges(df, col("v"), k)
        .head.getSeq[Double](0)
      val sorted = vs.flatten.sorted
      val n = sorted.size
      val want = (1 until k)
        .map(x => math.ceil((n.toLong * x).toDouble / k.toDouble).toLong)
        .toSet.toSeq.filter(r => r >= 1 && r <= n)
        .map(r => sorted(r.toInt - 1)).sorted
      assert(got === want, s"k=$k vs=$vs")
    }
  }

  test("winsorizedRollup: clipped sum is bounded by n·p_lo and n·p_hi") {
    val vGen = Gen.listOfN(50, Gen.choose(-1e6, 1e6))
    cases(vGen, 5).foreach { vs =>
      val df = vs.zipWithIndex.map { case (v, i) => ("g", v, i.toLong) }
        .toDF("grp", "v", "k")
      val r = RobustStats.winsorizedRollup(df, col("grp"), col("v"), col("k")).head
      val (n, lo, hi, sum) = (r.getLong(1), r.getDouble(2), r.getDouble(3), r.getDouble(4))
      assert(sum >= n * lo - 0.01 && sum <= n * hi + 0.01,
        s"n=$n lo=$lo hi=$hi sum=$sum")
    }
  }

  test("epochShuffle + temperatureMixture compose: sampled-then-shuffled is a subset permutation") {
    val df = (1L to 300L).map(i => (i, if (i <= 250) "big" else "small")).toDF("id", "st")
    val mixed = Sampling.temperatureMixture(df, col("id"), col("st"), 0.5, 0.6)
    val shuffled = Sampling.epochShuffle(mixed, col("id"), 4, "e1")
    val ids = shuffled.select("id").as[Long].collect()
    assert(ids.distinct.length === ids.length)
    assert(ids.toSet.subsetOf((1L to 300L).toSet))
    assert(shuffled.count() === mixed.count())
  }
}
