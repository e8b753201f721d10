package graft.streaming

import java.nio.file.Files

import graft.SparkSpec
import graft.sources.Tables
import org.apache.spark.sql.functions._

/**
 * Stream ≡ batch for the online feedback metrics: the q149 logs derived
 * from the events table, drained through
 * [[Streams.feedbackMetricsStream]] (stream-static join + windowed agg)
 * must equal [[graft.ml.Feedback.feedbackMetrics]] row-for-row.
 */
class FeedbackStreamSpec extends SparkSpec {

  private def tmp(prefix: String): String =
    Files.createTempDirectory(prefix).toString

  /** The q149 log construction (MlQueries.feedbackLogs shape) on
    * sf0.001 events. */
  private lazy val logs = {
    val ev = Tables.load(spark, "/root/testdata/sf0.001", "events")
      .select("event_id", "ts", "user_id", "event_type", "value")
    val fb = ev.select(
      concat(lit("pred_u"), col("user_id"), lit("_d"),
        to_date(col("ts")).cast("string")).as("prediction_id"),
      when(col("event_type") === "view", "viewed")
        .when(col("event_type") === "click", "clicked")
        .when(col("event_type") === "signup", "accepted")
        .when(col("event_type") === "purchase", "converted")
        .otherwise("rejected").as("feedback_type"),
      col("ts").as("created_at"),
      when(col("event_type") === "purchase", col("value"))
        .as("outcome_value"))
    val preds = ev.select(col("user_id"), to_date(col("ts")).as("d"))
      .distinct()
      .select(
        concat(lit("pred_u"), col("user_id"), lit("_d"),
          col("d").cast("string")).as("prediction_id"),
        graft.ml.AbRouter.assignVariant(
          concat(lit("sess-u"), col("user_id").cast("string")),
          Seq("v1" -> 0.5, "v2" -> 0.3, "v3" -> 0.2)).as("model_version"))
    (preds, fb)
  }

  test("feedbackMetricsStream drain equals the batch feedbackMetrics " +
      "rollup row-for-row") {
    val (preds, fb) = logs
    // stage the feedback log as ONE parquet file → one micro-batch
    val dir = s"${tmp("graft-fbstream")}/fb"
    fb.coalesce(1).write.parquet(dir)
    val schema = spark.read.parquet(dir).schema
    // no withWatermark here: feedbackMetricsStream applies its own
    val stream = spark.readStream.schema(schema).parquet(dir)
    val out = s"${tmp("graft-fbstream-out")}/rollup"
    val writer = Streams.feedbackMetricsStream(stream, preds)
      .writeStream
      .outputMode("update")
      .foreachBatch { (batch: org.apache.spark.sql.DataFrame, _: Long) =>
        batch.write.mode("append").parquet(out)
        ()
      }
    Streams.runAvailableNow(writer, tmp("graft-fbstream-ckpt"))
    val streamed = spark.read.parquet(out)
    val batch = graft.ml.Feedback.feedbackMetrics(preds, fb)
      .withColumn("window_day", col("window_day").cast("string"))
      .select(streamed.columns.map(col): _*)
    assert(streamed.count() === batch.count())
    assert(streamed.except(batch).isEmpty && batch.except(streamed).isEmpty)
    // and the rollup is non-trivial: multiple versions × days
    assert(batch.select("model_version").distinct().count() === 3)
    assert(batch.count() > 30)
  }
}
