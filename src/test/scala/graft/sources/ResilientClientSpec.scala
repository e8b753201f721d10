package graft.sources

import scala.collection.mutable

import org.apache.spark.sql.functions._

import graft.SparkSpec
import graft.sources.ResilientClient._

/**
 * The live-connector control plane under a VIRTUAL clock: every wait is
 * asserted exactly (recorded sleeps), every retry/re-auth transition is
 * scripted, and the end-to-end extract is proven row-identical to the
 * source table through the real DSv2 data plane. Reference semantics:
 * src/connectors/salesforce.py (rate limiter :480-507, 401 loop
 * :308-343, backoff :179, pagination :317-337).
 */
class ResilientClientSpec extends SparkSpec {

  private class VClock extends Clock {
    var t: Long = 0L
    val sleeps: mutable.Buffer[Long] = mutable.Buffer.empty
    def nowMs: Long = t
    def sleepMs(ms: Long): Unit = { sleeps += ms; t += ms }
  }

  test("token bucket: burst up to capacity is free, then waits refill-paced") {
    val clock = new VClock
    val bucket = new TokenBucket(callsPerMinute = 3, clock)
    (1 to 3).foreach(_ => bucket.acquire())
    assert(clock.sleeps.isEmpty, "burst within capacity must not wait")
    bucket.acquire() // empty bucket: must wait one refill interval (20s)
    assert(clock.sleeps.toSeq === Seq(20000L))
    clock.t += 40000 // 40s idle refills 2 tokens
    bucket.acquire(); bucket.acquire()
    assert(clock.sleeps.size === 1, "refilled tokens must not wait")
  }

  test("backoff: 5xx retried with doubling delays, Retry-After overrides, " +
      "budget exhaustion throws") {
    val clock = new VClock
    val bucket = new TokenBucket(600, clock)
    val auth = new AuthSession(() => "tok", ttlMs = 3600000, clock)
    val script = mutable.Queue[Response](
      Response(500, ""), Response(503, ""), Response(200, "ok"))
    val r = ResilientClient.execute(_ => script.dequeue(), bucket, auth,
      RetryPolicy(maxTries = 3, baseDelayMs = 100), clock, Request("u"))
    assert(r.body === "ok")
    assert(clock.sleeps.toSeq === Seq(100L, 200L), "expo sequence")

    val clock2 = new VClock
    val script2 = mutable.Queue[Response](
      Response(429, "", Map("Retry-After" -> "7")), Response(200, "ok"))
    ResilientClient.execute(_ => script2.dequeue(), new TokenBucket(600, clock2),
      new AuthSession(() => "tok", 3600000, clock2),
      RetryPolicy(maxTries = 3, baseDelayMs = 100), clock2, Request("u"))
    assert(clock2.sleeps.toSeq === Seq(7000L), "server Retry-After wins")

    // RFC HTTP-date Retry-After must not crash the retry loop — it
    // falls back to the expo delay; an absurd numeric value is capped
    val policy = RetryPolicy(maxTries = 3, baseDelayMs = 100,
      maxDelayMs = 10000)
    assert(policy.delayMs(1,
      Some("Fri, 14 Aug 2026 10:00:00 GMT")) === 100L)
    assert(policy.delayMs(1, Some("86400")) === 10000L,
      "server-dictated day-long sleep capped at maxDelayMs")
    // a NEGATIVE or overflow-prone numeric Retry-After must not reach
    // Thread.sleep (IllegalArgumentException would crash the loop):
    // out-of-range values fall back to the expo delay
    assert(policy.delayMs(1, Some("-1")) === 100L)
    assert(policy.delayMs(2, Some("99999999999999999")) === 200L)
    assert(policy.delayMs(1, Some(Long.MinValue.toString)) === 100L)

    val clock3 = new VClock
    intercept[TransportException] {
      ResilientClient.execute(_ => Response(500, ""), new TokenBucket(600, clock3),
        new AuthSession(() => "tok", 3600000, clock3),
        RetryPolicy(maxTries = 3, baseDelayMs = 100), clock3, Request("u"))
    }
    assert(clock3.sleeps.size === 2, "maxTries=3 sleeps twice then throws")
  }

  test("transport errors consume the same retry budget") {
    val clock = new VClock
    var calls = 0
    val r = ResilientClient.execute({ _ =>
        calls += 1
        if (calls < 3) throw new TransportException("conn reset")
        Response(200, "ok")
      }, new TokenBucket(600, clock),
      new AuthSession(() => "tok", 3600000, clock),
      RetryPolicy(maxTries = 3, baseDelayMs = 100), clock, Request("u"))
    assert(r.body === "ok" && calls === 3)
    assert(clock.sleeps.toSeq === Seq(100L, 200L))
  }

  test("401 invalidates the cached token and retries the SAME url without " +
      "consuming retry budget; a rejected FRESH token surfaces the 401") {
    val clock = new VClock
    var tokenN = 0
    val auth = new AuthSession(() => { tokenN += 1; s"tok$tokenN" },
      ttlMs = 3600000, clock)
    val seen = mutable.Buffer[String]()
    val r = ResilientClient.execute({ req =>
        seen += req.headers("Authorization")
        if (req.headers("Authorization") == "Bearer tok1") Response(401, "")
        else Response(200, "ok")
      }, new TokenBucket(600, clock), auth,
      RetryPolicy(maxTries = 1), clock, Request("u"))
    assert(r.body === "ok")
    assert(seen.toSeq === Seq("Bearer tok1", "Bearer tok2"))
    assert(auth.authCount === 2)
    assert(clock.sleeps.isEmpty, "re-auth is not a backoff event")

    // fresh token ALSO rejected → the 401 comes back to the caller
    // loudly instead of an auth storm
    val auth2 = new AuthSession(() => "tok", 3600000, clock)
    val r2 = ResilientClient.execute(_ => Response(401, ""), new TokenBucket(600, clock),
      auth2, RetryPolicy(maxTries = 3), clock, Request("u"))
    assert(r2.status === 401)
    assert(auth2.authCount === 2, "exactly one re-auth per request")
  }

  test("auth session caches until ttl, then refreshes") {
    val clock = new VClock
    var n = 0
    val auth = new AuthSession(() => { n += 1; s"t$n" }, ttlMs = 1000, clock)
    assert(auth.bearer() === "t1" && auth.bearer() === "t1")
    clock.t += 1001
    assert(auth.bearer() === "t2", "expired token must refresh")
  }

  test("paginated extract through a flaky transport lands in staging " +
      "exactly once and the DSv2 read-back is row-identical to the table") {
    // serve the nation table as 3 header-ful CSV pages, with a 401 (stale
    // token), a 429 and a 500 injected at scripted points — the full
    // gauntlet of the reference's _query_rest loop
    val rows = graft.sources.Tables.load(spark, "/root/testdata/sf0.001", "nation")
      .select("n_nationkey", "n_name", "n_regionkey")
      .orderBy("n_nationkey").collect()
    val header = "n_nationkey,n_name,n_regionkey"
    val pages = rows.grouped(9).map(chunk =>
      (header +: chunk.map(r => s"${r.get(0)},${r.getString(1)},${r.get(2)}"))
        .mkString("\n")).toSeq
    assert(pages.size === 3)

    val clock = new VClock
    val bucket = new TokenBucket(600, clock)
    var tokenN = 0
    val auth = new AuthSession(() => { tokenN += 1; s"tok$tokenN" }, 3600000, clock)
    // the first bearer is stale (every call with it 401s once), page 1's
    // first clean attempt is throttled, page 2's first clean attempt 500s
    val inject = mutable.Queue(429, 500)
    val transport: Transport = { req =>
      val idx = req.url.stripPrefix("page/").toInt
      if (req.headers("Authorization") == "Bearer tok1") Response(401, "")
      else if (idx == 1 && inject.headOption.contains(429)) {
        inject.dequeue(); Response(429, "", Map("Retry-After" -> "2"))
      } else if (idx == 2 && inject.headOption.contains(500)) {
        inject.dequeue(); Response(500, "")
      } else Response(200, pages(idx),
        if (idx + 1 < pages.size) Map("Next-Url" -> s"page/${idx + 1}")
        else Map.empty)
    }
    val call = (r: Request) => ResilientClient.execute(transport, bucket,
      auth, RetryPolicy(maxTries = 3, baseDelayMs = 100), clock, r)
    val staging = java.nio.file.Files
      .createTempDirectory("graft-staging").toString + "/nation"
    val n = ResilientClient.extractToStaging(call, "page/0",
      r => Page(r.body, r.headers.get("Next-Url")), staging)
    assert(n === 3)
    assert(auth.authCount === 2, "exactly one re-auth for the stale token")
    assert(clock.sleeps.toSeq === Seq(2000L, 100L),
      "Retry-After throttle then one expo backoff")
    // re-run (idempotent resume): same staging state, no duplicates
    assert(ResilientClient.extractToStaging(call, "page/0",
      r => Page(r.body, r.headers.get("Next-Url")), staging) === 3)
    // a SHRUNK re-run deletes the now-stale trailing batch files
    val shrunkTransport: Transport = { req =>
      val idx = req.url.stripPrefix("page/").toInt
      Response(200, pages(idx),
        if (idx + 1 < 2) Map("Next-Url" -> s"page/${idx + 1}") else Map.empty)
    }
    val shrunkCall = (r: Request) => ResilientClient.execute(shrunkTransport,
      bucket, auth, RetryPolicy(), clock, r)
    assert(ResilientClient.extractToStaging(shrunkCall, "page/0",
      r => Page(r.body, r.headers.get("Next-Url")), staging) === 2)
    assert(new java.io.File(staging).listFiles()
      .count(_.getName.endsWith(".csv")) === 2,
      "stale batch_00002.csv must be deleted")
    // restore the full staging state for the read-back assertion below
    assert(ResilientClient.extractToStaging(call, "page/0",
      r => Page(r.body, r.headers.get("Next-Url")), staging) === 3)
    // a non-2xx final response is never staged as data
    intercept[TransportException] {
      ResilientClient.extractToStaging(
        _ => Response(403, "<html>quota denied</html>"), "page/0",
        r => Page(r.body, r.headers.get("Next-Url")),
        staging + "-err")
    }
    assert(!new java.io.File(staging + "-err", "batch_00000.csv").exists,
      "the 403 error body must not land in staging")
    // a FAILED re-run against existing staging leaves only the fresh
    // prefix — never a fresh-prefix + stale-tail mix a reader would
    // see as one consistent (wrong) dataset
    val failingTransport: Transport = { req =>
      val idx = req.url.stripPrefix("page/").toInt
      if (idx == 0) Response(200, pages(0), Map("Next-Url" -> "page/1"))
      else Response(500, "")
    }
    intercept[TransportException] {
      ResilientClient.extractToStaging(
        r => ResilientClient.execute(failingTransport, bucket, auth,
          RetryPolicy(), clock, r),
        "page/0", r => Page(r.body, r.headers.get("Next-Url")), staging)
    }
    assert(new java.io.File(staging).listFiles()
      .filter(_.getName.endsWith(".csv")).map(_.getName).toSet
      === Set("batch_00000.csv"),
      "failure must purge stale batches at-or-beyond the fresh prefix")
    assert(new java.io.File(staging, ResilientClient.IncompleteSentinel)
      .exists, "a mixed/partial generation must carry the sentinel")
    // the reader-side gate refuses the marked directory
    intercept[IllegalArgumentException] {
      ResilientClient.assertComplete(staging)
    }
    // a PAGE-0 failure (nothing of the new generation written) must NOT
    // wipe what is already staged
    intercept[TransportException] {
      ResilientClient.extractToStaging(
        r => ResilientClient.execute(_ => Response(500, ""), bucket, auth,
          RetryPolicy(), clock, r),
        "page/0", r => Page(r.body, r.headers.get("Next-Url")), staging)
    }
    assert(new java.io.File(staging).listFiles()
      .exists(_.getName == "batch_00000.csv"),
      "page-0 failure must leave existing staging untouched")
    // restore full staging once more for the read-back below; success
    // clears the sentinel
    assert(ResilientClient.extractToStaging(call, "page/0",
      r => Page(r.body, r.headers.get("Next-Url")), staging) === 3)
    assert(!new java.io.File(staging, ResilientClient.IncompleteSentinel)
      .exists, "a completed extract must clear the sentinel")
    ResilientClient.assertComplete(staging) // gate passes when complete

    val back = spark.read.format(BulkCsvSource.format)
      .schema("n_nationkey LONG, n_name STRING, n_regionkey LONG")
      .load(staging)
    val src = graft.sources.Tables.load(spark, "/root/testdata/sf0.001", "nation")
      .select(col("n_nationkey").cast("long"), col("n_name"),
        col("n_regionkey").cast("long"))
    assert(back.count() === src.count())
    assert(back.except(src).isEmpty && src.except(back).isEmpty)
  }
}
