package graft.serve

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/**
 * Ops-observability surface (VERDICT r15 #5) — the engine-side
 * realization of the reference's Grafana dashboard
 * (`observability/grafana-dashboard.json`: Success Rate, P95 Latency,
 * Request Rate, Error Rate panels over `http_requests_total` /
 * `http_request_duration_seconds`): a bounded in-process request ledger
 * the transport adapter feeds, plus the rollup that computes exactly
 * those panel values per route template.
 *
 * Split of responsibilities: [[Recorder]] is the `http_requests_total`
 * counter family (one row per served request, route-TEMPLATE labeled so
 * cardinality stays bounded like a Prometheus label set); [[rollup]] is
 * the panel math. P95 is an EXACT order statistic (value at rank
 * ⌈0.95·n⌉ with a deterministic tiebreak — the RobustStats discipline,
 * engine-exact, no histogram-bucket interpolation), which a DuckDB
 * oracle replays bit-for-bit (q207). On a real cluster the recorder's
 * snapshot is what a metrics scraper exports; the rollup runs as a
 * declared query over the persisted request log.
 */
object OpsMetrics {

  final case class RequestMetric(ts_ms: Long, route: String,
                                 method: String, status: Int,
                                 latency_ms: Double, rows: Long)

  /** Thread-safe bounded request ledger: at `maxEntries` the OLDEST
    * half is dropped (amortized O(1) per record) — an ops buffer must
    * never become the memory leak it is meant to detect. */
  final class Recorder(maxEntries: Int = 100000) {
    require(maxEntries >= 2, "recorder needs room for at least 2 entries")
    private val buf =
      scala.collection.mutable.ArrayBuffer[RequestMetric]()
    def record(m: RequestMetric): Unit = synchronized {
      if (buf.size >= maxEntries) buf.remove(0, maxEntries / 2)
      buf += m
    }
    def snapshot: Seq[RequestMetric] = synchronized(buf.toVector)
    def toDF(spark: SparkSession): DataFrame = {
      import spark.implicits._
      val s = snapshot
      if (s.isEmpty)
        Seq.empty[RequestMetric].toDF()
      else s.toDF()
    }
  }

  /**
   * The Grafana panel math per route: request count, success rate
   * (status < 400), error rate (status >= 500), exact-p95 latency, and
   * total rows served. One aggregation pass + one window pass over the
   * log — both shuffle on `route` only (the label set, bounded by the
   * route-template count, never request cardinality).
   *
   * `tiebreak` must be unique per row for a deterministic p95 when
   * latencies tie (the oracle-parity requirement).
   */
  def rollup(log: DataFrame, route: Column = col("route"),
             status: Column = col("status"),
             latency: Column = col("latency_ms"),
             rows: Column = col("rows"),
             tiebreak: Column = col("ts_ms")): DataFrame = {
    val base = log.select(route.as("route"), status.as("status"),
      latency.cast("double").as("latency_ms"),
      rows.cast("long").as("rows_served"), tiebreak.as("tb"))
    val aggs = base.groupBy("route").agg(
      count(lit(1)).as("n_requests"),
      avg((col("status") < 400).cast("double")).as("success_rate"),
      avg((col("status") >= 500).cast("double")).as("error_rate"),
      sum("rows_served").as("rows_served"))
    val w = Window.partitionBy("route")
    val p95 = base
      .withColumn("rn", row_number().over(
        w.orderBy(col("latency_ms").asc, col("tb").asc)))
      .withColumn("cnt", count(lit(1)).over(w))
      .filter(col("rn") ===
        ceil(col("cnt").cast("double") * lit(0.95)).cast("long"))
      .select(col("route"), col("latency_ms").as("p95_latency_ms"))
    aggs.join(p95, Seq("route"), "left")
      .select(col("route"), col("n_requests"), col("success_rate"),
        col("error_rate"), col("p95_latency_ms"), col("rows_served"))
  }
}
