package graft.serve

import org.apache.spark.sql.functions._

import graft.SparkSpec
import graft.serve.ApiShell._
import graft.sources.ResilientClient.Clock

/**
 * End-to-end drive of the serving shell (reference api/main.py
 * :61-77,227-268,330-341,432-478,794-857): login → bearer →
 * filter/sort/paginate/export through the facade, with the 401/429/400
 * policy edges — expired token, revoked user, over-limit rejection and
 * refill, bad export format, bad parameter.
 */
class ApiShellSpec extends SparkSpec {
  import spark.implicits._

  /** Virtual clock: rate-limit refill and token expiry are asserted
    * exactly, never slept for. */
  private class VClock extends Clock {
    var now: Long = 1700000000000L
    def nowMs: Long = now
    def sleepMs(ms: Long): Unit = { now += ms }
  }

  private lazy val recs = Seq(
    (1, 0.9, "High", "Industry Expansion", "o1", "o2", "2024-03-01 00:00:00", 900.0),
    (2, 0.7, "Medium", "Partner Referral", "o3", "o1", "2024-03-05 00:00:00", 700.0),
    (3, 0.4, "Low", "Market Development", "o2", "o3", "2024-03-10 00:00:00", 400.0),
    (4, 0.95, "Very High", "Industry Expansion", "o4", "o5", "2024-03-15 00:00:00", 950.0)
  ).toDF("id", "score", "confidence", "recommendation_type",
      "org1_id", "org2_id", "created_at_s", "estimated_value")
    .withColumn("created_at", col("created_at_s").cast("timestamp"))
    .drop("created_at_s")

  private def mkShell(callsPerMinute: Int = 100)
      : (Shell, VClock, UserStore, TokenService) = {
    val clock = new VClock
    val users = new UserStore
    users.put(User("alice", "s3cret", "admin"))
    val tokens = new TokenService("test-secret", clock, expirationHours = 1)
    (new Shell(recs, users, tokens, clock, callsPerMinute),
      clock, users, tokens)
  }

  private def bearerOf(r: Result): String = r match {
    case OkText(t) => t
    case other => fail(s"expected a token grant, got $other")
  }

  test("login: wrong password 401, right password grants a verifiable token") {
    val (shell, _, _, tokens) = mkShell()
    assert(shell.login("alice", "wrong") == ApiError(401,
      "Incorrect username or password"))
    assert(shell.login("mallory", "s3cret") == ApiError(401,
      "Incorrect username or password"))
    val t = bearerOf(shell.login("alice", "s3cret"))
    assert(tokens.verify(t) == Right(("alice", "admin")))
  }

  test("recommendations: filter + sort + paginate through the facade") {
    val (shell, _, _, _) = mkShell()
    val t = bearerOf(shell.login("alice", "s3cret"))
    // no token → 401; garbage token → 401
    assert(shell.recommendations(Map.empty, None) ==
      ApiError(401, "Not authenticated"))
    assert(shell.recommendations(Map.empty, Some("not.a.token")) ==
      ApiError(401, "Invalid token"))
    // min_score + org OR-list, default sort score desc
    val Ok(df1) = (shell.recommendations(
      Map("min_score" -> "0.5", "org_ids" -> "o1"), Some(t))
      : @unchecked)
    assert(df1.select("id").as[Int].collect().toSeq == Seq(1, 2))
    // date window + explicit asc sort + offset/limit paging
    val Ok(df2) = (shell.recommendations(
      Map("date_from" -> "2024-03-02 00:00:00", "sort_by" -> "score",
        "sort_order" -> "asc", "limit" -> "1", "offset" -> "1"), Some(t))
      : @unchecked)
    assert(df2.select("id").as[Int].collect().toSeq == Seq(2))
    // unknown sort key falls back to score (whitelist), not an error
    val Ok(df3) = (shell.recommendations(
      Map("sort_by" -> "id; DROP TABLE"), Some(t)) : @unchecked)
    assert(df3.select("id").as[Int].collect().toSeq == Seq(4, 1, 2, 3))
    // unparseable parameter is a 400, not an exception
    shell.recommendations(Map("min_score" -> "high"), Some(t)) match {
      case ApiError(400, _) => ()
      case other => fail(s"expected 400, got $other")
    }
  }

  test("token expiry and user revocation both 401") {
    val (shell, clock, users, _) = mkShell()
    val t = bearerOf(shell.login("alice", "s3cret"))
    clock.now += 3601L * 1000 // past the 1h expiry
    assert(shell.recommendations(Map.empty, Some(t)) ==
      ApiError(401, "Token expired"))
    // fresh token, then delete the user: outstanding token is revoked
    clock.now += 1000
    val t2 = bearerOf(shell.login("alice", "s3cret"))
    users.delete("alice")
    assert(shell.recommendations(Map.empty, Some(t2)) ==
      ApiError(401, "Invalid authentication credentials"))
  }

  test("rate limit: over-limit 429 keyed per identifier, refills with time") {
    val (shell, clock, _, _) = mkShell(callsPerMinute = 3)
    val t = bearerOf(shell.login("alice", "s3cret"))
    (1 to 3).foreach { _ =>
      assert(shell.recommendations(Map.empty, Some(t)).isInstanceOf[Ok])
    }
    assert(shell.recommendations(Map.empty, Some(t)) ==
      ApiError(429, "Rate limit exceeded"))
    // the limiter admits BEFORE auth: an anonymous caller has its own
    // bucket (keyed client host), unaffected by alice's exhaustion
    assert(shell.recommendations(Map.empty, None,
      clientHost = Some("10.0.0.9")) == ApiError(401, "Not authenticated"))
    // 20s at 3/min refills one token
    clock.now += 20000
    assert(shell.recommendations(Map.empty, Some(t)).isInstanceOf[Ok])
    assert(shell.recommendations(Map.empty, Some(t)) ==
      ApiError(429, "Rate limit exceeded"))
  }

  test("export: csv and json roundtrip the filtered page; bad format 400") {
    val (shell, _, _, _) = mkShell()
    val t = bearerOf(shell.login("alice", "s3cret"))
    assert(shell.export("parquet", "/tmp/x", Map.empty, Some(t)) ==
      ApiError(400, "Format must be csv, excel, or json"))
    val base = java.nio.file.Files.createTempDirectory("graft-api").toString
    val params = Map("min_score" -> "0.5", "sort_order" -> "desc")
    shell.export("csv", s"$base/csv", params, Some(t)) match {
      case OkText(p) =>
        val back = spark.read.option("header", "true").csv(p)
        assert(back.count() == 3)
        assert(back.select("id").as[String].collect().toSeq ==
          Seq("4", "1", "2")) // written in served order
      case other => fail(s"csv export failed: $other")
    }
    shell.export("json", s"$base/json", params, Some(t)) match {
      case OkText(p) =>
        assert(spark.read.json(p).count() == 3)
      case other => fail(s"json export failed: $other")
    }
    shell.export("excel", s"$base/x.xlsx", params, Some(t)) match {
      case OkText(p) =>
        assert(java.nio.file.Files.size(java.nio.file.Paths.get(p)) > 0)
      case other => fail(s"excel export failed: $other")
    }
  }

  test("health is unauthenticated and unlimited") {
    val (shell, _, _, _) = mkShell(callsPerMinute = 1)
    (1 to 5).foreach { _ =>
      assert(shell.health == OkText("""{"status":"healthy"}"""))
    }
  }
}
