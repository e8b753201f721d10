package graft.app

import org.apache.spark.sql.functions._

import graft.SparkSpec
import graft.sources.Synthetic

/** E1 pipeline chain: validate → candidates/features/score → ranked
  * write, with S12 sync-log bookkeeping. */
class PipelineRunnerSpec extends SparkSpec {

  private def pipelineAccounts = Synthetic.accounts(spark, 120)
    .select(
      col("Id").as("id"),
      (col("_idx") % 3).cast("string").as("org"),
      col("Industry").as("industry"),
      col("BillingCountry").as("country"),
      col("NumberOfEmployees").as("employees"),
      col("CreatedDate").as("created"),
      col("LastActivityDate").as("last_activity"),
      col("AnnualRevenue").as("revenue"))

  test("pipeline runs all stages, writes ranked recommendations, logs sync") {
    val out = java.nio.file.Files.createTempDirectory("graft-pipe").toString
    val report = PipelineRunner.run(spark, pipelineAccounts,
      java.sql.Date.valueOf("2024-01-01"), out, topK = 40)
    assert(report.status == "success",
      report.results.map(r => s"${r.stage}:${r.status}:${r.error}").mkString(" | "))
    assert(report.results.map(_.stage) == Seq("validate", "score", "write"))

    val recs = spark.read.parquet(s"$out/recommendations")
    assert(recs.count() > 0)
    assert(recs.columns.contains("rank") && recs.columns.contains("confidence"))
    // rank is a dense total order from 1
    assert(recs.agg(min("rank")).head.getInt(0) == 1)
    val writeRecords = report.results.find(_.stage == "write").get.records
    assert(writeRecords == recs.count(), "observed write metric == row count")

    val log = PipelineRunner.syncLog(spark, report)
    assert(log.filter(col("status") === "success").count() == 3)
  }

  test("contract violation fails the validate stage and downstream skips") {
    val bad = pipelineAccounts.withColumn("revenue", lit(-5.0))
    val out = java.nio.file.Files.createTempDirectory("graft-pipe2").toString
    val report = PipelineRunner.run(spark, bad,
      java.sql.Date.valueOf("2024-01-01"), out)
    assert(report.status == "failed")
    assert(report.results.map(_.stage) == Seq("validate"))
  }
}
