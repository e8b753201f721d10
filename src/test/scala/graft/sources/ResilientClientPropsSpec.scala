package graft.sources

import scala.collection.mutable

import org.scalacheck.Gen
import org.scalatest.funsuite.AnyFunSuite

import graft.PropsCases
import graft.sources.ResilientClient._

/**
 * Fault-injection property for the extract protocol: for ANY scripted
 * fault sequence per page (429 / 500 / transport error / stale-401),
 * `extractToStaging` either completes with EXACTLY the expected page
 * files, or throws with staging holding only a prefix of CORRECT page
 * bodies — an error body is never on disk, a page is never duplicated
 * or truncated. The success/failure outcome itself is predicted from
 * the script (retryable failures < maxTries per page, no two
 * consecutive 401s) and asserted, so the resilience budget's semantics
 * are pinned, not just its safety.
 */
class ResilientClientPropsSpec extends AnyFunSuite with PropsCases {

  override protected def seedBase: Long = 7L

  private class VClock extends Clock {
    var t: Long = 0L
    def nowMs: Long = t
    def sleepMs(ms: Long): Unit = { t += ms }
  }

  // per page: a pre-success fault script drawn from the full outcome set
  private val faultGen: Gen[List[String]] =
    Gen.choose(0, 4).flatMap(k =>
      Gen.listOfN(k, Gen.oneOf("429", "500", "conn", "401")))

  test("any fault script: success stages exactly the pages, failure " +
      "stages only a correct prefix; outcome matches the retry budget") {
    val maxTries = 3
    val scriptsGen = Gen.choose(1, 5).flatMap(n => Gen.listOfN(n, faultGen))
    cases(scriptsGen, 40).foreach { scripts =>
      val n = scripts.size
      val bodies = (0 until n).map(i => s"col\nrow$i")
      // outcome prediction from the script alone
      def pageFails(s: List[String]): Boolean =
        s.count(_ != "401") >= maxTries ||
          s.sliding(2).exists(_ == List("401", "401"))
      val expectFail = scripts.exists(pageFails)

      val clock = new VClock
      var tokenN = 0
      val auth = new AuthSession(() => { tokenN += 1; s"tok$tokenN" },
        ttlMs = Long.MaxValue, clock)
      val remaining = mutable.Map(scripts.zipWithIndex.map {
        case (s, i) => i -> mutable.Queue(s: _*)
      }: _*)
      val staleTokens = mutable.Set[String]()
      val transport: Transport = { req =>
        val idx = req.url.stripPrefix("page/").toInt
        val tok = req.headers("Authorization").stripPrefix("Bearer ")
        if (staleTokens.contains(tok)) Response(401, "AUTH ERROR")
        else remaining(idx).headOption match {
          case Some("401") =>
            remaining(idx).dequeue()
            staleTokens += tok // this token is now stale; next call re-auths
            Response(401, "AUTH ERROR")
          case Some("429") =>
            remaining(idx).dequeue(); Response(429, "THROTTLED")
          case Some("500") =>
            remaining(idx).dequeue(); Response(500, "SERVER ERROR")
          case Some("conn") =>
            remaining(idx).dequeue()
            throw new TransportException("conn reset")
          case _ =>
            Response(200, bodies(idx),
              if (idx + 1 < n) Map("Next-Url" -> s"page/${idx + 1}")
              else Map.empty)
        }
      }
      val call = (r: Request) => ResilientClient.execute(transport,
        new TokenBucket(100000, clock), auth,
        RetryPolicy(maxTries = maxTries, baseDelayMs = 1), clock, r)
      val staging = java.nio.file.Files
        .createTempDirectory("graft-prop-staging").toString
      val outcome = scala.util.Try(ResilientClient.extractToStaging(
        call, "page/0", r => Page(r.body, r.headers.get("Next-Url")),
        staging))

      assert(outcome.isFailure === expectFail,
        s"scripts=$scripts predicted expectFail=$expectFail got $outcome")
      val files = new java.io.File(staging).listFiles()
        .filter(_.getName.endsWith(".csv")).sortBy(_.getName)
      // every staged file is a bit-correct page for its index — never an
      // error body, never truncated
      files.foreach { f =>
        val i = f.getName.stripPrefix("batch_").stripSuffix(".csv").toInt
        val content = new String(
          java.nio.file.Files.readAllBytes(f.toPath), "UTF-8")
        assert(content === bodies(i), s"file $i corrupted: '$content'")
      }
      if (outcome.isSuccess) {
        assert(outcome.get === n)
        assert(files.map(_.getName).toSeq ===
          (0 until n).map(i => f"batch_$i%05d.csv"))
      } else {
        // prefix property: pages stage in order, so indices are 0..k-1
        assert(files.map(_.getName.stripPrefix("batch_")
          .stripSuffix(".csv").toInt).toSeq === files.indices.toSeq)
      }
    }
  }
}
