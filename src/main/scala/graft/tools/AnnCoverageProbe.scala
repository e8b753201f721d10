package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import graft.functions.VectorFunctions
import graft.operators.{SimilaritySearch, TopK}
import graft.sources.Tables

/**
 * Probed-list coverage / scan-fraction sweep for the TRAINED IVF family
 * — the instrument behind the round-16 attack on the 0.81 recall@10
 * ceiling (VERDICT r15 #2). For each (kIvf, A, nprobe) config over the
 * AnnRecall gate fixture it prints:
 *
 *   coverage = |exact-L2-top-10 ∩ probed-list members| / (10 · queries)
 *   scan     = distinct probed candidate pairs / (queries · corpus)
 *
 * Coverage is the EXACT ceiling of any in-list search (ADC + refine
 * recovers all of it at rf=3 — measured: refined 0.81 == exact-in-list
 * 0.81 on the single-assignment index), so the config search optimizes
 * coverage-at-fixed-scan directly instead of re-running the full PQ
 * pipeline per config. Dev instrument, not a declared query: the chosen
 * config is pinned by AnnRecallSpec floors + MetricsLedger goldens.
 */
object AnnCoverageProbe {

  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/testdata/sf0.01")
    val spark = SparkSession.builder()
      .master("local[8]")
      .config("spark.sql.shuffle.partitions", 8)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    val K = 10
    val e = Tables.load(spark, dir, "embeddings")
      .select(col("vec_id").as("id"), col("embedding"))
      .cache()
    val n = e.count()
    val queries = e.filter(col("id") % 50 === 7)
      .select(col("id").as("qid"), col("embedding").as("qv"))
      .cache()
    val nq = queries.count()
    def l2sq(a: org.apache.spark.sql.Column, b: org.apache.spark.sql.Column) =
      aggregate(zip_with(a, b, (x, y) => {
        val d = x.cast("double") - y.cast("double"); d * d
      }), lit(0.0), _ + _)
    val truth = TopK.topKPerGroup(
      e.crossJoin(broadcast(queries)).filter(col("id") =!= col("qid"))
        .select(col("qid"), col("id"),
          l2sq(col("embedding"), col("qv")).as("l2")),
      Seq(col("qid")), Seq(col("l2").asc, col("id").asc), K)
      .select("qid", "id").cache()
    truth.count()

    // end-to-end refined recall at the chosen spill config: trained PQ
    // (m=8 x 8-d x 256 codes) ADC shortlist of rf*K within probed lists,
    // exact-L2 re-rank — the full q204 composition
    locally {
      val M = 8; val SubDim = 8; val KSub = 256
      val cents = SimilaritySearch.ivfCentroidsKMeansL2(e, col("id"),
        col("embedding"), 100).cache()
      val assign = SimilaritySearch.assignAgainstL2TopA(cents, e,
        col("id"), col("embedding"), 2).select("id", "cid").cache()
      val cb = SimilaritySearch.pqCodebookSubKMeans(e, col("id"),
        col("embedding"), M, SubDim, KSub)
      val codes = SimilaritySearch.pqCodesSub(e, col("id"),
        col("embedding"), cb, M, SubDim).cache()
      val ql2 = queries.crossJoin(broadcast(cents))
        .select(col("qid"), col("cid"), l2sq(col("qv"), col("cvr")).as("cd"))
      val qd = queries.crossJoin(broadcast(cb))
        .select(col("qid"), col("s"), col("cid"),
          l2sq(slice(col("qv"), col("s") * SubDim + 1, lit(SubDim)),
            col("cvs")).as("dq"))
      val adc = codes.join(broadcast(qd), Seq("s", "cid"))
        .groupBy("qid", "id").agg(sum("dq").as("adc"))
        .filter(col("id") =!= col("qid")).cache()
      for (np <- Seq(14, 18); rf <- Seq(3, 5)) {
        val probed = TopK.topKPerGroup(ql2, Seq(col("qid")),
          Seq(col("cd").asc, col("cid").asc), np).select("qid", "cid")
        val cand = probed.join(assign, "cid")
          .filter(col("id") =!= col("qid"))
          .select("qid", "id").distinct().cache()
        val scan = cand.count().toDouble / (nq * n)
        val shortl = TopK.topKPerGroup(cand.join(adc, Seq("qid", "id")),
          Seq(col("qid")), Seq(col("adc").asc, col("id").asc), rf * K)
        val top = TopK.topKPerGroup(
          shortl.select("qid", "id")
            .join(e.select(col("id"), col("embedding")), "id")
            .join(broadcast(queries), "qid")
            .select(col("qid"), col("id"),
              l2sq(col("embedding"), col("qv")).as("l2")),
          Seq(col("qid")), Seq(col("l2").asc, col("id").asc), K)
        val rec = truth.join(top.select("qid", "id"), Seq("qid", "id"))
          .count().toDouble / (K * nq)
        cand.unpersist()
        println(f"SPILL kIvf=100 A=2 np=$np%2d rf=$rf  " +
          f"refined_recall=$rec%.3f  scan=$scan%.3f")
      }
      Seq(cents, assign, codes, adc).foreach(_.unpersist())
    }
    // OPQ vs flat trained PQ at the SAME code budget: full-corpus ADC
    // recall (no IVF — isolates quantizer quality), m=8 x 8-d x 256
    locally {
      val M = 8; val SubDim = 8; val KSub = 256; val D = 64
      def adcRecall(vecs: org.apache.spark.sql.DataFrame,
                    qs: org.apache.spark.sql.DataFrame,
                    cb: org.apache.spark.sql.DataFrame): Double = {
        val codes = SimilaritySearch.pqCodesSub(vecs, col("id"), col("v"),
          cb, M, SubDim)
        val qd = qs.crossJoin(broadcast(cb))
          .select(col("qid"), col("s"), col("cid"),
            l2sq(slice(col("qv"), col("s") * SubDim + 1, lit(SubDim)),
              col("cvs")).as("dq"))
        val adc = codes.join(broadcast(qd), Seq("s", "cid"))
          .groupBy("qid", "id").agg(sum("dq").as("adc"))
          .filter(col("id") =!= col("qid"))
        val top = TopK.topKPerGroup(adc, Seq(col("qid")),
          Seq(col("adc").asc, col("id").asc), K)
        truth.join(top.select("qid", "id"), Seq("qid", "id")).count()
          .toDouble / (K * nq)
      }
      val ev = e.select(col("id"),
        transform(col("embedding"), x => x.cast("double")).as("v"))
      val qv = queries.select(col("qid"), col("qv"))
      // flat baseline
      val cbFlat = SimilaritySearch.pqCodebookSubKMeans(ev, col("id"),
        col("v"), M, SubDim, KSub)
      println(f"OPQ  baseline flat ADC recall = ${adcRecall(ev, qv, cbFlat)}%.3f")
      for (iters <- Seq(2, 3)) {
        val t0 = System.nanoTime()
        val (r, cbOpq) = SimilaritySearch.opqTrain(ev, col("id"), col("v"),
          M, SubDim, KSub, iters = iters)
        val trainS = (System.nanoTime() - t0) / 1e9
        val evR = ev.select(col("id"),
          SimilaritySearch.rotated(col("v"), r, D).as("v"))
        val qR = qv.select(col("qid"),
          SimilaritySearch.rotated(col("qv"), r, D).as("qv"))
        println(f"OPQ  iters=$iters ADC recall = ${adcRecall(evR, qR, cbOpq)}%.3f" +
          f"  (train ${trainS}%.1fs)")
      }
    }
    for (kIvf <- Seq(25, 50, 100)) {
      val cents = SimilaritySearch.ivfCentroidsKMeansL2(e, col("id"),
        col("embedding"), kIvf).cache()
      val kEff = cents.count() // empty clusters drop; k is an upper bound
      val ql2 = queries.crossJoin(broadcast(cents))
        .select(col("qid"), col("cid"), l2sq(col("qv"), col("cvr")).as("cd"))
        .cache()
      for (a <- Seq(1, 2, 3)) {
        val assign = SimilaritySearch.assignAgainstL2TopA(cents, e,
          col("id"), col("embedding"), a).select("id", "cid").cache()
        assign.count()
        for (np <- Seq(3, 5, 7, 10, 13, 14, 15, 16, 17, 18, 19, 20, 27)) {
          if (np <= kEff) {
            val probed = TopK.topKPerGroup(ql2, Seq(col("qid")),
              Seq(col("cd").asc, col("cid").asc), np).select("qid", "cid")
            val cand = probed.join(assign, "cid")
              .filter(col("id") =!= col("qid"))
              .select("qid", "id").distinct().cache()
            val scan = cand.count().toDouble / (nq * n)
            val cov = truth.join(cand, Seq("qid", "id")).count()
              .toDouble / (K * nq)
            cand.unpersist()
            println(f"kIvf=$kIvf%3d (eff $kEff%3d) A=$a np=$np%2d  " +
              f"coverage=$cov%.3f  scan=$scan%.3f")
          }
        }
        assign.unpersist()
      }
      cents.unpersist(); ql2.unpersist()
    }
    spark.stop()
  }
}
