package graft.ml

import org.apache.spark.sql.functions._
import org.scalacheck.Gen

import graft.{PropsCases, SparkSpec}

/**
 * Property invariants for the feedback-loop analytics, generalized
 * beyond the q149/q150/q152 fixtures: for ANY random log set the
 * relational rollups must equal a straightforward in-memory
 * recomputation (counts, guarded rates, revenue, label precedence,
 * min-count gate), and the z-test must be antisymmetric between a
 * variant pair when control flips. Small domains (few predictions,
 * few versions, coarse timestamps) force the collisions that matter:
 * multi-feedback predictions, versions straddling the gate, zero
 * impression cells.
 */
class FeedbackPropsSpec extends SparkSpec with PropsCases {

  override protected def seedBase: Long = 7L

  private lazy val s = spark
  import s.implicits._

  private val Types =
    Seq("viewed", "ignored", "clicked", "accepted", "rejected", "converted")

  private val caseGen = for {
    nPred <- Gen.choose(4, 12)
    nFb <- Gen.choose(10, 60)
    preds <- Gen.const((0 until nPred).map(i =>
      (s"p$i", s"v${i % 3}", i / 10.0)))
    fb <- Gen.listOfN(nFb, for {
      p <- Gen.choose(0, nPred - 1)
      t <- Gen.oneOf(Types)
      ts <- Gen.choose(0L, 200000L) // ~2.3 days → multiple day windows
      v <- Gen.option(Gen.choose(1, 500).map(_.toDouble))
    } yield (s"p$p", t, ts, v))
  } yield (preds, fb)

  test("feedbackMetrics equals an in-memory recomputation for random logs") {
    cases(caseGen, 6).foreach { case (preds, fb) =>
      val predsDf = preds.toDF("prediction_id", "model_version", "score")
      val fbDf = fb.toDF("prediction_id", "feedback_type", "t", "outcome_value")
        .select(col("prediction_id"), col("feedback_type"),
          timestamp_seconds(col("t")).as("created_at"), col("outcome_value"))
      val got = Feedback.feedbackMetrics(predsDf, fbDf).collect()
        .map(r => (r.getString(0), r.getDate(1).toString) ->
          (r.getLong(2), r.getLong(3), r.getDouble(4), r.getLong(5),
            r.getLong(7), r.getDouble(9)))
        .toMap
      // reference model in plain Scala
      val version = preds.map(p => p._1 -> p._2).toMap
      val expected = fb
        .map { case (p, t, ts, v) =>
          ((version(p), java.time.Instant.ofEpochSecond(ts)
            .atZone(java.time.ZoneOffset.UTC).toLocalDate.toString),
            (t, v))
        }
        .groupBy(_._1)
        .map { case (k, rows) =>
          val ts0 = rows.map(_._2)
          val impr = ts0.count(r => r._1 == "viewed" || r._1 == "ignored")
          val click = ts0.count(_._1 == "clicked")
          val conv = ts0.count(_._1 == "converted")
          val rev = BigDecimal(ts0.filter(_._1 == "converted")
            .map(_._2.getOrElse(0.0)).sum).setScale(2,
            BigDecimal.RoundingMode.HALF_UP)
          k -> (impr.toLong, click.toLong,
            if (impr > 0)
              BigDecimal(click.toDouble / impr).setScale(6,
                BigDecimal.RoundingMode.HALF_UP).toDouble
            else 0.0,
            ts0.count(_._1 == "accepted").toLong, conv.toLong,
            rev.toDouble)
        }
      assert(got.keySet === expected.keySet)
      expected.foreach { case (k, (impr, click, ctr, acc, conv, rev)) =>
        val g = got(k)
        assert(g._1 === impr && g._2 === click && g._4 === acc &&
          g._5 === conv, s"counts at $k")
        assert(math.abs(g._3 - ctr) < 1e-9, s"ctr at $k: ${g._3} vs $ctr")
        assert(math.abs(g._6 - rev) < 0.011, s"revenue at $k")
      }
    }
  }

  test("trainingData: labels equal the any-positive-else-any-negative " +
      "rule and the gate keeps exactly the versions at/over the bar") {
    cases(caseGen, 6).foreach { case (preds, fb) =>
      val predsDf = preds.toDF("prediction_id", "model_version", "score")
      val fbDf = fb.toDF("prediction_id", "feedback_type", "t", "outcome_value")
        .select(col("prediction_id"), col("feedback_type"),
          timestamp_seconds(col("t")).as("created_at"), col("outcome_value"))
      val minCount = 2L
      val got = Feedback.trainingData(predsDf, fbDf,
          cutoff = timestamp_seconds(lit(0)), minFeedbackCount = minCount)
        .select("prediction_id", "label").collect()
        .map(r => r.getString(0) -> r.getDouble(1)).toMap
      val version = preds.map(p => p._1 -> p._2).toMap
      val labels = fb.groupBy(_._1).flatMap { case (p, rows) =>
        val ts = rows.map(_._2).toSet
        if (ts.contains("converted") || ts.contains("accepted"))
          Some(p -> 1.0)
        else if (ts.contains("rejected")) Some(p -> 0.0)
        else None
      }
      val keep = labels.keys.groupBy(version).view
        .mapValues(_.size).filter(_._2 >= minCount).keySet.toSet
      val expected = labels.filter { case (p, _) => keep(version(p)) }
      assert(got === expected)
    }
  }

  test("variantComparison: z flips sign exactly when control flips " +
      "between two variants; decisions stay consistent with z") {
    cases(caseGen, 6).foreach { case (preds, fb) =>
      val predsDf = preds.toDF("prediction_id", "model_version", "score")
      val fbDf = fb.toDF("prediction_id", "feedback_type", "t", "outcome_value")
        .select(col("prediction_id"), col("feedback_type"),
          timestamp_seconds(col("t")).as("created_at"), col("outcome_value"))
      def zOf(control: String) =
        Feedback.variantComparison(predsDf, fbDf, control).collect()
          .map(r => r.getAs[String]("model_version") ->
            (r.getAs[Double]("z"), r.getAs[String]("decision"),
              r.getAs[Long]("trials"))).toMap
      val a = zOf("v0"); val b = zOf("v1")
      // pooled-se z is symmetric in the pair → sign flip when the
      // control flips (both cells non-degenerate)
      if (a.contains("v1") && b.contains("v0") &&
          a("v1")._3 > 0 && b("v0")._3 > 0) {
        assert(math.abs(a("v1")._1 + b("v0")._1) < 2e-6,
          s"z not antisymmetric: ${a("v1")._1} vs ${b("v0")._1}")
      }
      a.foreach { case (v, (z, d, _)) =>
        // decision uses the UNROUNDED z internally; the output z is
        // rounded to 6dp — at the exact 1.96 boundary either side is
        // consistent, so the check carries a rounding tolerance
        if (v == "v0") assert(d === "control" && z === 0.0)
        else if (z > 1.96 + 1e-6) assert(d === "promote")
        else if (z < -1.96 - 1e-6) assert(d === "rollback")
        else if (math.abs(math.abs(z) - 1.96) > 1e-6) assert(d === "hold")
      }
    }
  }
}
