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

  test("semanticDecontaminateStream drain equals the batch " +
      "decontaminateSemantic audit row-for-row (stored bench lists)") {
    val embs = Tables.load(spark, "/root/testdata/sf0.001", "embeddings")
    val bench = embs.filter(pmod(col("vec_id"), lit(10)) === 0)
    val corpus = embs.filter(pmod(col("vec_id"), lit(10)) =!= 0)
    // the stored artifacts: centroids + capped bench lists
    val cents = graft.operators.SimilaritySearch.ivfCentroids(bench,
      col("vec_id"), col("embedding"), 20)
    val lists = graft.operators.Corpus.semanticBenchLists(cents, bench,
      col("vec_id"), col("embedding"))
    // stage the corpus as one parquet file → one micro-batch
    val dir = s"${tmp("graft-semdecon")}/corpus"
    corpus.select("vec_id", "embedding").coalesce(1).write.parquet(dir)
    val schema = spark.read.parquet(dir).schema
    val stream = spark.readStream.schema(schema).parquet(dir)
    val out = s"${tmp("graft-semdecon-out")}/flags"
    val writer = Streams.semanticDecontaminateStream(stream, cents, lists,
        "vec_id", "embedding", nprobe = 2, threshold = 0.40)
      .writeStream
      .outputMode("append")
      .foreachBatch { (batch: org.apache.spark.sql.DataFrame, _: Long) =>
        batch.write.mode("append").parquet(out)
        ()
      }
    Streams.runAvailableNow(writer, tmp("graft-semdecon-ckpt"))
    val streamed = spark.read.parquet(out)
      .select(col("id"), col("bench_id"), round(col("cosine"), 6).as("c"))
    val batch = graft.operators.Corpus.decontaminateSemantic(corpus, bench,
        col("vec_id"), col("embedding"), modulus = 20, nprobe = 2,
        threshold = 0.40)
      .select(col("id"), col("bench_id"), round(col("cosine"), 6).as("c"))
    assert(streamed.count() === batch.count() && batch.count() > 0)
    assert(streamed.except(batch).isEmpty && batch.except(streamed).isEmpty)
  }
}
