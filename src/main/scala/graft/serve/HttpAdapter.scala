package graft.serve

import com.sun.net.httpserver.{HttpExchange, HttpServer}

import graft.serve.ApiShell._

/**
 * The HTTP binding [[ApiShell]]'s scaladoc claimed was "a ~20-line
 * adapter" — now proven, JDK-only (`com.sun.net.httpserver`, zero
 * dependencies): every route delegates to the Shell, which owns ALL
 * policy (admission, authn, role freshness, query compile, pagination,
 * serialization targets). The adapter does exactly the transport jobs:
 * route matching, query-string/body parsing, bearer extraction, status
 * + body emission. Reference surface: src/api/main.py (FastAPI/uvicorn
 * is the transport detail this replaces).
 *
 * Scale/ops shape: the engine work per request is a Spark plan built by
 * the Shell — the adapter never touches data. The JDK server's executor
 * is the caller's choice (default: a small fixed pool); production
 * placement is one adapter per driver, the same topology as any Spark
 * job server. Start with [[HttpAdapter.start]] (port 0 = ephemeral,
 * returned for the spec to dial); stop with [[HttpAdapter.Handle.stop]].
 */
object HttpAdapter {

  final case class Handle(server: HttpServer) {
    def port: Int = server.getAddress.getPort
    def stop(): Unit = server.stop(0)
  }

  private def urlencoded(s: String): Map[String, String] =
    s.split('&').filter(_.contains('=')).map { kv =>
      val Array(k, v) = kv.split("=", 2)
      java.net.URLDecoder.decode(k, "UTF-8") ->
        java.net.URLDecoder.decode(v, "UTF-8")
    }.toMap

  private def queryParams(ex: HttpExchange): Map[String, String] =
    urlencoded(Option(ex.getRequestURI.getRawQuery).getOrElse(""))

  private def bearer(ex: HttpExchange): Option[String] =
    Option(ex.getRequestHeaders.getFirst("Authorization"))
      .filter(_.startsWith("Bearer ")).map(_.drop(7))

  private def clientHost(ex: HttpExchange): Option[String] =
    Option(ex.getRemoteAddress).map(_.getAddress.getHostAddress)

  private def body(ex: HttpExchange): String =
    new String(ex.getRequestBody.readAllBytes(),
      java.nio.charset.StandardCharsets.UTF_8)

  /** application/x-www-form-urlencoded or flat-JSON bodies → map (the
    * reference's token route takes an OAuth2 form; PATCH takes JSON). */
  private def bodyParams(s: String): Map[String, String] =
    if (s.trim.startsWith("{"))
      "\"([A-Za-z_]+)\"\\s*:\\s*\"((?:[^\"\\\\]|\\\\.)*)\"".r
        .findAllMatchIn(s).map { m =>
          // full JSON unescape (\n \t \uXXXX, not just \" \\) so a PATCH
          // note with any legal client-emitted escape round-trips
          m.group(1) -> Json.unescape(m.group(2))
        }.toMap
    else urlencoded(s)

  private def send(ex: HttpExchange, status: Int, bodyStr: String,
                   contentType: String = "application/json"): Unit = {
    val bytes = bodyStr.getBytes(java.nio.charset.StandardCharsets.UTF_8)
    ex.getResponseHeaders.set("Content-Type", contentType)
    ex.sendResponseHeaders(status, if (bytes.isEmpty) -1 else bytes.length)
    if (bytes.nonEmpty) {
      val os = ex.getResponseBody
      try os.write(bytes) finally os.close()
    }
    ex.close()
  }

  private def jsonEscape(s: String): String = Json.escape(s)

  /** Serialize a Shell result: Ok frames as a JSON array of row objects
    * (bounded by the Shell's own pagination), errors as the reference's
    * {"detail": …} with the mapped status. Returns (status, rows
    * serialized) — the per-request facts the ops recorder ledgers. */
  private def emit(ex: HttpExchange, r: Result): (Int, Long) = r match {
    case Ok(df) =>
      val rows = df.toJSON.collect()
      send(ex, 200, rows.mkString("[", ",", "]"))
      (200, rows.length.toLong)
    case OkText(t) =>
      val b = if (t.trim.startsWith("{")) t
      else s"""{"result":"${jsonEscape(t)}"}"""
      send(ex, 200, b)
      (200, 0L)
    case OkSections(sections) =>
      var rows = 0L
      val b = sections.toSeq.sortBy(_._1).map { case (k, df) =>
        val rs = df.toJSON.collect()
        rows += rs.length
        s""""$k":${rs.mkString("[", ",", "]")}"""
      }.mkString("{", ",", "}")
      send(ex, 200, b)
      (200, rows)
    case ApiError(status, detail) =>
      send(ex, status, s"""{"detail":"${jsonEscape(detail)}"}""")
      (status, 0L)
  }

  private val RecId = "/api/recommendations/([0-9]+)".r
  private val Export = "/api/export/([a-z]+)".r

  /** Bind `shell` on `port` (0 = ephemeral). One handler, routed by
    * (method, path) — the Shell decides everything else. When the
    * Shell carries an ops recorder (the ONE wiring point — the adapter
    * reads it from the Shell, so /api/metrics can never serve a
    * different ledger than the one being fed), every served request
    * (including 404s and handler 500s) ledgers one
    * [[OpsMetrics.RequestMetric]] labeled by ROUTE TEMPLATE
    * (`/api/recommendations/{id}`, never the raw path — the Prometheus
    * bounded-label-cardinality rule). */
  def start(shell: Shell, port: Int = 0,
            exportDir: String =
              System.getProperty("java.io.tmpdir")): Handle = {
    val recorder = shell.opsRecorder
    val server = HttpServer.create(
      new java.net.InetSocketAddress("127.0.0.1", port), 0)
    server.setExecutor(java.util.concurrent.Executors.newFixedThreadPool(4))
    server.createContext("/", (ex: HttpExchange) => {
      val t0 = System.nanoTime()
      val method = ex.getRequestMethod.toUpperCase
      val path = ex.getRequestURI.getPath
      // ONE route table: each match arm yields (template, thunk). The
      // template is bound BEFORE the thunk runs (no body read, no shell
      // work), so an exception anywhere below ledgers under the CORRECT
      // template — and a future endpoint cannot forget a parallel
      // template match, because there isn't one (the per-route Grafana
      // error-rate panel would otherwise show zero while 500s pile up
      // under "unmatched").
      val routed: Option[(String, () => Result)] = (method, path) match {
        case ("GET", "/api/health") =>
          Some("/api/health" -> (() => shell.health))
        case ("POST", "/api/auth/token") =>
          Some("/api/auth/token" -> { () =>
            val p = bodyParams(body(ex))
            shell.login(p.getOrElse("username", ""),
              p.getOrElse("password", ""), clientHost(ex))
          })
        case ("GET", "/api/auth/me") =>
          Some("/api/auth/me" ->
            (() => shell.whoami(bearer(ex), clientHost(ex))))
        case ("GET", "/api/metrics") =>
          Some("/api/metrics" ->
            (() => shell.metrics(bearer(ex), clientHost(ex))))
        case ("GET", "/api/recommendations") =>
          Some("/api/recommendations" ->
            (() => shell.recommendations(queryParams(ex), bearer(ex),
              clientHost(ex))))
        case ("GET", RecId(id)) =>
          // toLongOption: an over-long digit run is "no such id" (404),
          // not a NumberFormatException surfacing as a 500
          Some("/api/recommendations/{id}" ->
            (() => id.toLongOption.fold(
              ApiError(404, "Recommendation not found"): Result)(
              shell.recommendation(_, bearer(ex), clientHost(ex)))))
        case ("PATCH", RecId(id)) =>
          Some("/api/recommendations/{id}" ->
            (() => id.toLongOption.fold(
              ApiError(404, "Recommendation not found"): Result)(
              shell.updateRecommendation(_, bodyParams(body(ex)),
                bearer(ex), clientHost(ex)))))
        case ("GET", Export(format)) =>
          Some("/api/export/{format}" -> { () =>
            val out = s"$exportDir/graft_export_${System.nanoTime()}.$format"
            shell.export(format, out, queryParams(ex), bearer(ex),
              clientHost(ex))
          })
        case _ => None
      }
      val route = routed.fold("unmatched")(_._1)
      def ledger(status: Int, rows: Long): Unit =
        recorder.foreach(_.record(OpsMetrics.RequestMetric(
          System.currentTimeMillis(), route, method, status,
          (System.nanoTime() - t0) / 1e6, rows)))
      try {
        routed match {
          case Some((_, run)) =>
            val (status, rows) = emit(ex, run())
            ledger(status, rows)
          case None =>
            send(ex, 404, """{"detail":"Not found"}""")
            ledger(404, 0L)
        }
      } catch {
        case e: Throwable =>
          try send(ex, 500,
            s"""{"detail":"${jsonEscape(String.valueOf(e.getMessage))}"}""")
          catch { case _: Throwable => () }
          ledger(500, 0L)
      }
    })
    server.start()
    Handle(server)
  }
}
