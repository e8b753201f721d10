package graft.streaming

import java.sql.Timestamp

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.streaming.StreamingQuery

import graft.SparkSpec

/**
 * Long-horizon state-store soak for the sketch-maintenance twins
 * (VERDICT r13 #6): the per-micro-batch equality gates in `StreamsSpec`
 * prove each trigger is right; this proves 110 triggers of key CHURN
 * (a sliding key population, one new key every 2 batches, old keys
 * going idle) keep `numRowsTotal` bounded by the in-horizon population
 * — the difference between "state is evicted on a toy timeline" and
 * "a quarter of continuous ingest won't fill the state store".
 *
 * Bound: with event time advancing 1h per batch, a 6h idle timeout and
 * a 1h watermark delay, at most ~8 keys are in-horizon at once (+1 for
 * timeout-fires-next-trigger lag). The assert uses 12; the run creates
 * 55 distinct keys, so an eviction leak reads as 40+, not 13.
 */
class StreamsSoakSpec extends SparkSpec {
  import spark.implicits._

  private def tmp(prefix: String): String =
    java.nio.file.Files.createTempDirectory(prefix).toString

  private val Batches = 110
  private val Bound = 12L

  /** Drive `mk` (a watermarked (key, ts, value-string) frame → snapshot
    * stream) through the churn timeline; assert the state bound every
    * 10 triggers and at the end. */
  private def soak(name: String)
                  (mk: DataFrame => org.apache.spark.sql.Dataset[_])
                  (implicit pos: org.scalactic.source.Position): Unit = {
    val mem = MemoryStream[(String, Timestamp, String)](spark)
    val snaps = mk(mem.toDF.toDF("key", "ts", "value")
      .withWatermark("ts", "1 hour"))
    val q: StreamingQuery = snaps.toDF.writeStream.format("memory")
      .queryName(s"soak_$name").outputMode("update")
      .option("checkpointLocation", tmp(s"graft-soak-$name"))
      .start()
    def stateRows: Long =
      q.lastProgress.stateOperators.map(_.numRowsTotal).sum
    var peak = 0L
    val base = Timestamp.valueOf("2024-01-01 00:00:00").getTime
    for (i <- 0 until Batches) {
      val ts = new Timestamp(base + i.toLong * 3600 * 1000)
      val key = s"k${i / 2}"
      val prev = s"k${math.max(0, i / 2 - 1)}"
      mem.addData(
        (key, ts, s"v$i-a"), (key, ts, s"v$i-b"), (prev, ts, s"p$i"))
      q.processAllAvailable()
      val rows = stateRows
      peak = math.max(peak, rows)
      if (i % 10 == 9) {
        assert(rows <= Bound,
          s"$name: $rows state rows at batch $i (bound $Bound) — " +
            "eviction is not keeping up with churn")
      }
    }
    assert(stateRows <= Bound,
      s"$name: ${stateRows} state rows after $Batches batches")
    assert(peak <= Bound,
      s"$name: peak state $peak exceeded bound $Bound during the soak")
    // the stream did real work: the final key's latest snapshot exists
    val lastKey = s"k${(Batches - 1) / 2}"
    val out = spark.table(s"soak_$name")
    assert(out.filter(out("key") === lastKey).count() > 0)
    q.stop()
  }

  test("kmvIngest state stays bounded through 110 batches of key churn") {
    soak("kmv")(df => Streams.kmvIngest(df, k = 8, idleTimeout = "6 hours"))
  }

  test("cmsIngest state stays bounded through 110 batches of key churn") {
    soak("cms")(df =>
      Streams.cmsIngest(df, depth = 3, width = 16, idleTimeout = "6 hours"))
  }

  test("histIngest state stays bounded through 110 batches of key churn") {
    soak("hist")(df => Streams.histIngest(
      df.withColumn("value", org.apache.spark.sql.functions.length(
        org.apache.spark.sql.functions.col("value")).cast("double")),
      lo = 0.0, hi = 16.0, bins = 8, idleTimeout = "6 hours"))
  }
}
