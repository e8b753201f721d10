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

  test("schema-evolution ingest: the pipeline spine runs over a " +
      "two-generation staged table read through readEvolved — the " +
      "alembic analog in composition, not just q205's standalone rollup") {
    val accts = pipelineAccounts
    val dir = java.nio.file.Files.createTempDirectory("graft-evo").toString
    // v1: pre-migration column name (rev), predates the country column
    accts.filter(col("employees") < 150)
      .select(col("id"), col("org"), col("industry"), col("employees"),
        col("created"), col("last_activity"), col("revenue").as("rev"))
      .write.mode("overwrite").parquet(s"$dir/v1")
    // v2: the current schema
    accts.filter(col("employees") >= 150)
      .write.mode("overwrite").parquet(s"$dir/v2")
    val merged = graft.sources.SchemaEvolution.readEvolved(spark, Seq(
        graft.sources.SchemaEvolution.Generation(s"$dir/v1",
          renames = Map("rev" -> "revenue")),
        graft.sources.SchemaEvolution.Generation(s"$dir/v2")),
      accts.schema, defaults = Map("country" -> lit("UNKNOWN")))
    val out = java.nio.file.Files.createTempDirectory("graft-pipe-evo").toString
    val report = PipelineRunner.run(spark, merged,
      java.sql.Date.valueOf("2024-01-01"), out, topK = 40)
    assert(report.status == "success",
      report.results.map(r => s"${r.stage}:${r.status}:${r.error}").mkString(" | "))
    // every account from BOTH generations entered the spine
    assert(report.results.find(_.stage == "validate").get.records ==
      accts.count())
    // the merged spine's output must be EXACTLY the single-frame run
    // over the same logical content — v1 rows predate country, so the
    // aligned baseline carries the declared default there too (the
    // migration changes WHERE rows live, never what the spine computes)
    val aligned = accts.withColumn("country",
      when(col("employees") < 150, lit("UNKNOWN")).otherwise(col("country")))
    val outBase = java.nio.file.Files.createTempDirectory("graft-pipe-base").toString
    PipelineRunner.run(spark, aligned,
      java.sql.Date.valueOf("2024-01-01"), outBase, topK = 40)
    val evolved = spark.read.parquet(s"$out/recommendations")
    val base = spark.read.parquet(s"$outBase/recommendations")
    assert(evolved.except(base).isEmpty && base.except(evolved).isEmpty,
      "evolved-ingest run must rank exactly the aligned baseline's rows")
  }

  test("contract violation fails the validate stage and downstream skips") {
    val bad = pipelineAccounts.withColumn("revenue", lit(-5.0))
    val out = java.nio.file.Files.createTempDirectory("graft-pipe2").toString
    val report = PipelineRunner.run(spark, bad,
      java.sql.Date.valueOf("2024-01-01"), out)
    assert(report.status == "failed")
    assert(report.results.map(_.stage) == Seq("validate"))
  }

  test("post-run notify: success delivers the opportunity digest through " +
      "the outbox; a re-run dedups; failure delivers the error alert") {
    import graft.serve.Notify
    val out = java.nio.file.Files.createTempDirectory("graft-pipe3").toString
    val outbox = s"$out/outbox"
    val delivered = scala.collection.mutable.Buffer[Notify.Message]()
    val cfg = PipelineRunner.NotifyConfig(
      sender = m => { delivered += m; () }, outboxDir = outbox,
      emailRecipients = Seq("ops@x.com"), slack = true)
    val report = PipelineRunner.run(spark, pipelineAccounts,
      java.sql.Date.valueOf("2024-01-01"), out, topK = 40,
      notify = Some(cfg))
    assert(report.status == "success")
    assert(report.results.map(_.stage) ==
      Seq("validate", "score", "write", "notify"))
    assert(report.results.find(_.stage == "notify").get.records === 2,
      "one email + one slack message sent")
    assert(delivered.map(_.channel).toSeq === Seq("email", "slack"))
    assert(delivered.head.subject.endsWith("Cross-Sell Opportunities"))
    // digest content is the REAL top-5 of the written recommendations
    val top = spark.read.parquet(s"$out/recommendations")
      .orderBy(col("score").desc, col("a_id"), col("b_id"))
      .select("a_id").limit(1).head.getString(0)
    assert(delivered.head.body.contains(top))

    // same pipeline output re-notified → outbox markers skip everything
    delivered.clear()
    val report2 = PipelineRunner.run(spark, pipelineAccounts,
      java.sql.Date.valueOf("2024-01-01"), out, topK = 40,
      notify = Some(cfg))
    assert(report2.results.find(_.stage == "notify").get.records === 0)
    assert(delivered.isEmpty, "identical digest must not re-send")

    // failure path: error alert to admins, pipeline still reports failed
    delivered.clear()
    val bad = pipelineAccounts.withColumn("revenue", lit(-5.0))
    val report3 = PipelineRunner.run(spark, bad,
      java.sql.Date.valueOf("2024-01-01"), out, notify = Some(cfg))
    assert(report3.status == "failed")
    assert(delivered.map(_.channel).toSeq === Seq("email", "slack"))
    assert(delivered.head.subject === "Cross-Sell Pipeline Error")
    assert(delivered.head.body.contains("stage validate"))

    // a successful run that prunes to ZERO recommendations sends
    // NOTHING — an empty digest is channel noise, not information
    delivered.clear()
    val out2 = java.nio.file.Files.createTempDirectory("graft-pipe4").toString
    val cfg2 = cfg.copy(outboxDir = s"$out2/outbox")
    val report4 = PipelineRunner.run(spark, pipelineAccounts,
      java.sql.Date.valueOf("2024-01-01"), out2, topK = 40,
      scoreThreshold = 2.0, notify = Some(cfg2)) // unreachable threshold
    assert(report4.status == "success")
    assert(report4.results.find(_.stage == "notify").get.records === 0)
    assert(delivered.isEmpty, "empty digest must not fan out")
  }

  test("live-extract composition: ResilientClient staging feeds the DSv2 " +
      "scan feeds the pipeline end-to-end") {
    import graft.sources.ResilientClient._
    // the "API" serves the accounts frame as 2 CSV pages
    val src = pipelineAccounts
      .select(col("id"), col("org"), col("industry"), col("country"),
        col("employees"), col("revenue"),
        date_format(col("created"), "yyyy-MM-dd").as("created"),
        date_format(col("last_activity"), "yyyy-MM-dd").as("last_activity"))
      .orderBy("id").collect()
    val header = "id,org,industry,country,employees,revenue,created,last_activity"
    val pages = src.grouped(60).map(chunk =>
      (header +: chunk.map(r => (0 until 8).map(r.get(_).toString)
        .mkString(","))).mkString("\n")).toSeq
    val transport: Transport = { req =>
      val idx = req.url.stripPrefix("p/").toInt
      Response(200, pages(idx),
        if (idx + 1 < pages.size) Map("Next-Url" -> s"p/${idx + 1}")
        else Map.empty)
    }
    val clock = new Clock {
      var t = 0L
      def nowMs: Long = t
      def sleepMs(ms: Long): Unit = { t += ms }
    }
    val call = (r: Request) => graft.sources.ResilientClient.execute(transport,
      new TokenBucket(600, clock), new AuthSession(() => "tok", 3600000, clock),
      RetryPolicy(), clock, r)
    val staging = java.nio.file.Files
      .createTempDirectory("graft-pipe-staging").toString + "/accounts"
    val extracted = PipelineRunner.extractAccounts(spark, call, "p/0",
      r => Page(r.body, r.headers.get("Next-Url")), staging,
      "id STRING, org STRING, industry STRING, country STRING, " +
        "employees DOUBLE, revenue DOUBLE, created STRING, " +
        "last_activity STRING")
    assert(extracted.count() === 120)
    val out = java.nio.file.Files.createTempDirectory("graft-pipe4").toString
    val report = PipelineRunner.run(spark, extracted,
      java.sql.Date.valueOf("2024-01-01"), out, topK = 40)
    assert(report.status == "success",
      report.results.map(r => s"${r.stage}:${r.status}:${r.error}").mkString(" | "))
    assert(spark.read.parquet(s"$out/recommendations").count() > 0)
  }
}
