package graft.sources

/**
 * Transport-agnostic resilient API client — the CONTROL-PLANE semantics
 * of the reference's live connector (reference:
 * src/connectors/salesforce.py — token cache + re-auth :89-214, 401
 * retry loop :308-343, expo backoff `@backoff.on_exception(max_tries=3)`
 * :179/:308, token-bucket rate limiter :480-507, nextRecordsUrl
 * pagination :310-343), realized against a PLUGGABLE transport
 * (`Request => Response`) instead of a live HTTP stack: this container
 * has zero egress, and more importantly the resilience protocol — what
 * retries, what re-authenticates, what waits — is transport-independent
 * logic that deserves deterministic tests. A production deployment
 * plugs a real HTTP call in as the transport function; every spec here
 * plugs in scripted fakes and a VIRTUAL clock, so backoff sequences and
 * bucket waits are asserted exactly, not approximately.
 *
 * Division of labor at scale: this client is the DRIVER-side control
 * plane — an API quota is a global resource, so admission control is
 * centralized by design (a 1000-executor fleet hammering a per-tenant
 * rate limit from every task is an outage, not parallelism). The
 * control plane lands pages as CSV batch files in a staging directory;
 * the DATA plane is the existing DSv2 [[BulkCsvSource]] scan of that
 * directory — distributed, columnar-pruned, filter-pushed. Fetch
 * bandwidth is page-size × rate-limit regardless of cluster size, which
 * is the API's constraint, not ours.
 */
object ResilientClient {

  final case class Request(url: String, headers: Map[String, String] = Map.empty)
  final case class Response(status: Int, body: String,
                            headers: Map[String, String] = Map.empty)

  /** The pluggable I/O edge. Throw [[TransportException]] for
    * connection-level failures (the aiohttp.ClientError analogue). */
  type Transport = Request => Response

  final class TransportException(msg: String) extends RuntimeException(msg)

  /** Deterministic time for specs: `nowMs` reads, `sleepMs` advances.
    * Production: `Clock.system`. */
  trait Clock {
    def nowMs: Long
    def sleepMs(ms: Long): Unit
  }
  object Clock {
    val system: Clock = new Clock {
      def nowMs: Long = System.currentTimeMillis()
      def sleepMs(ms: Long): Unit = Thread.sleep(ms)
    }
  }

  /**
   * Token-bucket rate limiter (reference RateLimiter :480-507, same
   * arithmetic): capacity = `callsPerMinute`, continuous refill at
   * callsPerMinute/60 per second, `acquire` blocks until a token is
   * available. Synchronized — the bucket is the SHARED admission gate
   * for every in-flight control-plane call.
   */
  final class TokenBucket(callsPerMinute: Int, clock: Clock) {
    require(callsPerMinute > 0)
    private var tokens: Double = callsPerMinute
    private var updatedAtMs: Long = clock.nowMs

    def acquire(): Unit = synchronized {
      val now = clock.nowMs
      tokens = math.min(callsPerMinute.toDouble,
        tokens + (now - updatedAtMs) / 1000.0 * (callsPerMinute / 60.0))
      updatedAtMs = now
      if (tokens < 1) {
        val waitMs = math.ceil((1 - tokens) * 60000.0 / callsPerMinute).toLong
        clock.sleepMs(waitMs)
        updatedAtMs = clock.nowMs
        tokens = 1
      }
      tokens -= 1
    }

    /** Non-blocking admission (the API-limiter mode, reference
      * api/main.py:61-77 — a web limiter REJECTS over-limit calls with
      * 429 rather than queueing them): same refill arithmetic, returns
      * false instead of sleeping when no token is available. */
    def tryAcquire(): Boolean = synchronized {
      val now = clock.nowMs
      tokens = math.min(callsPerMinute.toDouble,
        tokens + (now - updatedAtMs) / 1000.0 * (callsPerMinute / 60.0))
      updatedAtMs = now
      if (tokens < 1) false
      else { tokens -= 1; true }
    }
  }

  /** Exponential backoff (the reference's `backoff.expo`, max_tries=3
    * default): delay = base·2^(attempt−1) capped at `maxDelayMs`; a
    * numeric `Retry-After` header overrides the computed delay (the
    * server knows better) but still respects the cap — an admission
    * loop must not sleep a driver for a server-dictated day. The
    * RFC-allowed HTTP-date form is ignored (falls back to expo) rather
    * than crashing the retry loop on parse. */
  final case class RetryPolicy(maxTries: Int = 3, baseDelayMs: Long = 100,
                               maxDelayMs: Long = 10000) {
    def delayMs(attempt: Int, retryAfter: Option[String]): Long = {
      // defensive parse BOTH ways: a negative value would make
      // Thread.sleep throw, and a huge one overflows the *1000 to
      // negative — either crashes the retry loop a malicious/buggy
      // server must not control. Out-of-range → fall back to expo.
      val fromServer = retryAfter
        .flatMap(v => scala.util.Try(v.trim.toLong).toOption)
        .filter(s => s >= 0 && s <= Long.MaxValue / 1000)
        .map(_ * 1000)
      math.max(0L, math.min(maxDelayMs, fromServer.getOrElse(
        baseDelayMs << math.min(attempt - 1, 20))))
    }
  }

  /**
   * Cached bearer-token session (reference TokenManager :89-140 +
   * authenticate :155-177): `authenticate()` is invoked lazily, its
   * token reused until `ttlMs` elapses, and [[invalidate]] forces the
   * next call to re-authenticate (the 401 path). The reference persists
   * tokens in an encrypted SQLite cache; the cache POLICY (reuse until
   * expiry, refresh on rejection) is what matters to the protocol and
   * is what's realized — storage is an injection point, not logic.
   */
  final class AuthSession(authenticate: () => String, ttlMs: Long,
                          clock: Clock) {
    private var token: Option[String] = None
    private var fetchedAtMs: Long = 0L
    var authCount: Int = 0 // observability for specs/ops

    def bearer(): String = synchronized {
      if (token.isEmpty || clock.nowMs - fetchedAtMs >= ttlMs) {
        token = Some(authenticate()); fetchedAtMs = clock.nowMs
        authCount += 1
      }
      token.get
    }
    def invalidate(): Unit = synchronized { token = None }
  }

  /**
   * One resilient call — the composed protocol of `_query_rest`
   * (:308-343):
   *  1. admission: take a bucket token;
   *  2. attach `Authorization: Bearer <token>` from the session;
   *  3. 401 → invalidate + re-auth and retry the SAME url immediately
   *     (the reference's `continue` — re-auth is not a failure, it
   *     consumes no retry budget); at most once per attempt so a
   *     rejected FRESH token still fails loudly;
   *  4. 429/5xx or transport error → exponential backoff, up to
   *     `policy.maxTries` attempts, then the error propagates;
   *  5. any other status returns.
   */
  def execute(transport: Transport, bucket: TokenBucket, auth: AuthSession,
              policy: RetryPolicy, clock: Clock, req: Request): Response = {
    var attempt = 1
    var reAuthed = false
    while (true) {
      bucket.acquire()
      val resp =
        try Right(transport(Request(req.url,
          req.headers + ("Authorization" -> s"Bearer ${auth.bearer()}"))))
        catch { case e: TransportException => Left(e) }
      resp match {
        case Right(r) if r.status == 401 && !reAuthed =>
          auth.invalidate(); reAuthed = true // retry same url, same attempt
        case Right(r) if r.status == 429 || r.status >= 500 =>
          if (attempt >= policy.maxTries)
            throw new TransportException(
              s"${req.url} failed with ${r.status} after $attempt attempts")
          clock.sleepMs(policy.delayMs(attempt, r.headers.get("Retry-After")))
          attempt += 1; reAuthed = false
        case Right(r) => return r
        case Left(e) =>
          if (attempt >= policy.maxTries) throw e
          clock.sleepMs(policy.delayMs(attempt, None))
          attempt += 1; reAuthed = false
      }
    }
    throw new IllegalStateException("unreachable")
  }

  /** A page of records plus the next cursor — the parse half of the
    * reference's `data["records"] / data["nextRecordsUrl"] / done`
    * protocol, supplied by the caller (format-specific). */
  final case class Page(body: String, nextUrl: Option[String])

  /** A page fetch is done when [[execute]]'s resilience is exhausted OR
    * the final status is non-2xx (the documented non-retryable outcomes:
    * 401-on-a-fresh-token, 403, 404) — an error body must never be
    * mistaken for data. */
  private def checked(call: Request => Response, url: String): Response = {
    val r = call(Request(url))
    if (r.status < 200 || r.status >= 300)
      throw new TransportException(
        s"$url returned non-success ${r.status} — refusing to treat the " +
          "error body as a data page")
    r
  }

  // (cursor pagination is inherently serial — each cursor comes from the
  // previous response; parallelism lives in the data plane. The single
  // pagination entry point is extractToStaging: an accumulate-in-memory
  // variant was deliberately removed as unexercised dead surface.)

  /**
   * Control-plane extract → staging dir → DSv2 data plane: pages land
   * as `batch_NNNNN.csv` (the bulk-API batch-file layout q129/S2
   * reads), each written AS IT ARRIVES — driver memory is O(one page),
   * never O(extract), and a crash leaves the already-fetched prefix on
   * disk. Idempotent: page index is the file name (a re-run overwrites,
   * never duplicates) and stale `batch_*.csv` at-or-beyond the current
   * index are DELETED — on success (converging a shrunk source to
   * exactly the new page set) AND on failure (so the directory never
   * mixes a fresh prefix with a stale tail from an older generation; a
   * reader after a failed run sees a true prefix of the new extract,
   * nothing else). A non-2xx page response throws — an error body is
   * never staged as data; page writes go through Files.write, whose
   * IOExceptions THROW (PrintWriter would swallow them and report a
   * truncated file as success). Returns the staged file count. Each
   * page body must be a header-ful CSV chunk (the reference's bulk
   * result format); every page carries the same header, as
   * [[BulkCsvSource]] requires.
   */
  /** Sentinel marking a staging dir whose last extract did not finish:
    * present ⇒ the batch files are a true PREFIX of a newer generation,
    * not a complete dataset. Underscore-prefixed so scans ignore it. */
  val IncompleteSentinel = "_extract_incomplete"

  def extractToStaging(call: Request => Response, firstUrl: String,
                       parse: Response => Page, stagingDir: String): Int = {
    val dir = new java.io.File(stagingDir)
    dir.mkdirs()
    val sentinel = new java.io.File(dir, IncompleteSentinel)
    var i = 0
    def dropStaleFrom(n: Int): Boolean = {
      val pat = "batch_([0-9]{5})\\.csv".r
      Option(dir.listFiles()).getOrElse(Array.empty).forall { f =>
        f.getName match {
          case pat(idx) if idx.toInt >= n => f.delete()
          case _ => true
        }
      }
    }
    try {
      var next: Option[String] = Some(firstUrl)
      while (next.isDefined) {
        val page = parse(checked(call, next.get))
        if (i == 0) {
          // first page of the NEW generation landed: from here on the
          // directory is mixed-generation, so mark it incomplete until
          // the extract finishes (a failure BEFORE any write leaves the
          // previous complete extract untouched and unmarked)
          java.nio.file.Files.write(sentinel.toPath, Array.empty[Byte])
        }
        java.nio.file.Files.write(
          new java.io.File(dir, f"batch_$i%05d.csv").toPath,
          page.body.getBytes(java.nio.charset.StandardCharsets.UTF_8))
        i += 1
        next = page.nextUrl
      }
      // the stale-tail purge must SUCCEED before the dir is declared
      // complete — an undeletable stale file would otherwise mix
      // generations under a cleared sentinel
      require(dropStaleFrom(i),
        s"stale batch purge incomplete under $stagingDir — directory " +
          "left marked incomplete")
      require(sentinel.delete() || !sentinel.exists(),
        s"cannot clear $IncompleteSentinel under $stagingDir")
      i
    } catch {
      case e: Throwable =>
        // purge the stale tail ONLY once fresh pages were written (a
        // page-0 failure must not wipe the previous complete extract);
        // the sentinel stays — readers (assertComplete) can tell prefix
        // from dataset. Best-effort here: the sentinel already marks
        // the directory unreadable-as-complete.
        if (i > 0) dropStaleFrom(i)
        throw e
    }
  }

  /** Reader-side gate: throw unless the staging dir's last extract
    * COMPLETED ([[IncompleteSentinel]] absent). Data-plane consumers
    * (the DSv2 scan composition — `PipelineRunner.extractAccounts`)
    * call this before reading, so a crashed extract's prefix is never
    * silently consumed as a complete dataset. */
  def assertComplete(stagingDir: String): Unit =
    require(!new java.io.File(stagingDir, IncompleteSentinel).exists(),
      s"staging dir $stagingDir is marked INCOMPLETE (last extract did " +
        "not finish) — re-run the extract before reading")
}
