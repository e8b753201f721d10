package graft.app

import org.apache.spark.sql.functions._

import graft.SparkSpec
import graft.serve.ApiShell._
import graft.sources.{Layout, ResilientClient, Synthetic}

/**
 * The reference user journey end-to-end ON ENGINE OUTPUT: the batch
 * pipeline scores and ranks recommendations into the lake, the serving
 * shell exposes them behind auth + rate limiting, a client logs in,
 * lists with filters, reads a detail row, converts it (PATCH persisted
 * via the Layout point-upsert), exports, and reads insights — the
 * "switch from the reference" path as ONE spec instead of per-layer
 * gates.
 */
class ApiJourneySpec extends SparkSpec {
  import spark.implicits._

  private class VClock extends ResilientClient.Clock {
    var now: Long = 1700000000000L
    def nowMs: Long = now
    def sleepMs(ms: Long): Unit = { now += ms }
  }

  test("pipeline → lake → serving shell journey") {
    // 1. batch pipeline writes ranked recommendations
    val accounts = Synthetic.accounts(spark, 120).select(
      col("Id").as("id"), (col("_idx") % 3).cast("string").as("org"),
      col("Industry").as("industry"), col("BillingCountry").as("country"),
      col("NumberOfEmployees").as("employees"),
      col("CreatedDate").as("created"),
      col("LastActivityDate").as("last_activity"),
      col("AnnualRevenue").as("revenue"))
    val out = java.nio.file.Files.createTempDirectory("graft-journey").toString
    val report = PipelineRunner.run(spark, accounts,
      java.sql.Date.valueOf("2024-01-01"), out, topK = 40)
    assert(report.status == "success")

    // 2. adapt the pipeline frame to the serving schema (app wiring:
    //    rank is the serving id; recommendation_type derived from the
    //    score band as the q35 serving view does) and land it as the
    //    serving lake table
    val servingDir = s"$out/serving_recs"
    spark.read.parquet(s"$out/recommendations")
      .select(col("rank").cast("long").as("id"),
        col("score"), col("confidence"),
        when(col("score") > 0.7, "Industry Expansion")
          .otherwise("Market Development").as("recommendation_type"),
        col("a_org").as("org1_id"), col("b_org").as("org2_id"),
        lit("2024-01-01 00:00:00").cast("timestamp").as("created_at"),
        col("estimated_value"), col("next_best_action"),
        lit("new").as("status"), lit("").as("updated_at"))
      .write.mode("overwrite").parquet(servingDir)
    val serving = spark.read.parquet(servingDir)
    val total = serving.count()
    assert(total > 0)

    // 3. shell over the lake table, patch wired to the point-upsert
    val clock = new VClock
    val users = new UserStore
    users.put(User("rep", "pw", "sales"))
    val shell = new Shell(spark.read.parquet(servingDir), users,
      new TokenService("journey-secret", clock), clock,
      onUpdate = (id, m) => {
        Layout.patchRow(spark, servingDir, "id", id,
          m.map { case (k, v) => k -> lit(v) }
            .filter { case (k, _) => serving.columns.contains(k) })
        true
      })
    val token = shell.login("rep", "pw") match {
      case OkText(t) => t
      case other => fail(s"login failed: $other")
    }

    // 4. list: filtered + sorted + paged
    val listed = shell.recommendations(
      Map("min_score" -> "0.5", "sort_by" -> "score",
        "sort_order" -> "desc", "limit" -> "10"), Some(token)) match {
      case Ok(df) => df
      case other => fail(s"list failed: $other")
    }
    val ids = listed.select("id").as[Long].collect()
    assert(ids.nonEmpty && ids.length <= 10)
    // served order is score desc — the pipeline's rank order, so the
    // served ids are exactly ranks 1..n
    assert(ids.toSeq == (1L to ids.length).toSeq)

    // 5. detail → convert → persisted in the lake
    val target = ids.head
    assert(shell.recommendation(target, Some(token)).isInstanceOf[Ok])
    assert(shell.updateRecommendation(target,
      Map("status" -> "converted"), Some(token)) ==
      OkText("Recommendation updated successfully"))
    val after = spark.read.parquet(servingDir)
    assert(after.filter(col("id") === target).select("status")
      .as[String].head() == "converted")
    assert(after.filter(col("status") === "new").count() == total - 1)

    // 6. export the filtered page, re-readable
    shell.export("csv", s"$out/export_csv",
      Map("min_score" -> "0.5"), Some(token)) match {
      case OkText(p) =>
        assert(spark.read.option("header", "true").csv(p).count() > 0)
      case other => fail(s"export failed: $other")
    }

    // 7. insights over the frozen window
    shell.insights(30, java.sql.Timestamp.valueOf("2024-01-02 00:00:00"),
        Some(token), industry = col("recommendation_type"),
        action = col("next_best_action")) match {
      case OkSections(s) =>
        assert(s("summary").head().getAs[Long]("total_recommendations")
          == total)
        assert(s("top_opportunities").count() <= 5)
      case other => fail(s"insights failed: $other")
    }
  }
}
