package graft.serve

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** The ops ledger + Grafana panel math: exact-rank p95, rate
  * definitions, and the recorder's drop-oldest bound. */
class OpsMetricsSpec extends SparkSpec {
  import spark.implicits._

  test("rollup computes exact-rank p95 and the panel rates") {
    // 20 requests on one route: latencies 1..20 → p95 = value at rank
    // ceil(0.95*20)=19; two 4xx and one 5xx → success 17/20, error 1/20
    val log = (1 to 20).map { i =>
      val status = if (i <= 17) 200 else if (i <= 19) 401 else 503
      (i.toLong, "/api/recommendations", status, i.toDouble, 5L)
    }.toDF("ts_ms", "route", "status", "latency_ms", "rows")
    val r = OpsMetrics.rollup(log).head
    assert(r.getAs[Long]("n_requests") == 20L)
    assert(math.abs(r.getAs[Double]("success_rate") - 0.85) < 1e-12)
    assert(math.abs(r.getAs[Double]("error_rate") - 0.05) < 1e-12)
    assert(r.getAs[Double]("p95_latency_ms") == 19.0)
    assert(r.getAs[Long]("rows_served") == 100L)
  }

  test("p95 tiebreak is deterministic when latencies tie") {
    val log = (1 to 10).map(i =>
      (i.toLong, "/r", 200, 7.0, 0L))
      .toDF("ts_ms", "route", "status", "latency_ms", "rows")
    assert(OpsMetrics.rollup(log).head
      .getAs[Double]("p95_latency_ms") == 7.0)
  }

  test("recorder drops the oldest half at capacity — bounded memory") {
    val rec = new OpsMetrics.Recorder(maxEntries = 10)
    (1 to 15).foreach(i => rec.record(OpsMetrics.RequestMetric(
      i.toLong, "/r", "GET", 200, 1.0, 0L)))
    val snap = rec.snapshot
    assert(snap.size <= 10)
    // the newest entries survive; the oldest were shed
    assert(snap.last.ts_ms == 15L)
    assert(snap.head.ts_ms > 1L)
  }

  test("recorder truncation is not silent: dropped count + oldest " +
      "retained ts let a consumer tell a bounded window from history") {
    val rec = new OpsMetrics.Recorder(maxEntries = 10)
    (1 to 9).foreach(i => rec.record(OpsMetrics.RequestMetric(
      i.toLong, "/r", "GET", 200, 1.0, 0L)))
    assert(rec.dropped == 0L && rec.oldestRetainedTsMs.contains(1L))
    (10 to 15).foreach(i => rec.record(OpsMetrics.RequestMetric(
      i.toLong, "/r", "GET", 200, 1.0, 0L)))
    // capacity hit once at the 10th record: 5 evicted (maxEntries/2)
    assert(rec.dropped == 5L)
    assert(rec.oldestRetainedTsMs.contains(6L))
  }

  test("success_rate counts ONLY 2xx (the reference panel's " +
      "status=~\"2..\") — a redirect is not a success") {
    val log = Seq(
      (1L, "/r", 200, 1.0, 0L), (2L, "/r", 204, 2.0, 0L),
      (3L, "/r", 302, 3.0, 0L), (4L, "/r", 404, 4.0, 0L))
      .toDF("ts_ms", "route", "status", "latency_ms", "rows")
    assert(math.abs(OpsMetrics.rollup(log).head
      .getAs[Double]("success_rate") - 0.5) < 1e-12)
  }
}
