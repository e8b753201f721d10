package graft.serve

import scala.collection.mutable

import com.fasterxml.jackson.databind.ObjectMapper

import graft.SparkSpec

/** Rendering goldens + the at-least-once outbox protocol for the
  * notification layer (reference: src/utils/notifications.py). */
class NotifySpec extends SparkSpec {

  private lazy val digest: Notify.Digest = Notify.digestOf(
    graft.queries.ErQueries.queries("q120_notify_digest")(
      spark, "/root/testdata/sf0.001"))

  private val mapper = new ObjectMapper()

  test("digestOf collects the q120 frame: 5 ranked rows + headline stats") {
    assert(digest.top.size === 5)
    assert(digest.nTotal > 5, "headline count is the FULL set, not the top-5")
    assert(digest.totalValue > 0)
    // ranked by score descending (the frame's rank order)
    assert(digest.top.map(-_.score) === digest.top.map(-_.score).sorted)
  }

  test("email HTML/text render every opportunity with reference formatting " +
      "(2dp scores, $-grouped values), HTML-escaped") {
    val html = Notify.emailHtml(digest, "http://dash")
    val text = Notify.emailText(digest, "http://dash")
    assert(html.contains(s"<strong>${digest.nTotal}</strong>"))
    digest.top.foreach { o =>
      assert(html.contains(f"<td>${o.score}%.2f</td>"))
      assert(text.contains(f"Score: ${o.score}%.2f"))
    }
    assert(text.contains("1. ") && text.contains("5. "))
    // money grouping: $1,234 style (no decimals)
    val moneyRe = """\$[0-9]{1,3}(,[0-9]{3})*""".r
    assert(moneyRe.findFirstIn(html).isDefined)
    assert(!html.contains("$-1"), "sanity")
    // escaping: a crafted action cannot inject markup
    val evil = Notify.Digest(1, 10.0, Seq(Notify.Opportunity(
      "<script>", "b", 0.5, 10, "<img src=x>")))
    val eh = Notify.emailHtml(evil, "http://dash")
    assert(!eh.contains("<script>") && eh.contains("&lt;script&gt;"))
    // ATTRIBUTE context: a double quote in the (config-sourced)
    // dashboard url must not break out of href="..."
    val ah = Notify.emailHtml(digest, "http://dash/\" onclick=\"x()")
    assert(!ah.contains("href=\"http://dash/\" onclick="))
    assert(ah.contains("&quot;"))
  }

  test("slack blocks + teams card are valid JSON with header, summary and " +
      "top-3 sections") {
    val slack = mapper.readTree(Notify.slackBlocksJson(digest, "http://dash"))
    val blocks = slack.get("blocks")
    assert(blocks.size() === 2 + 3, "header + summary + top-3")
    assert(blocks.get(0).get("type").asText() === "header")
    assert(blocks.get(2).get("accessory").get("url").asText() === "http://dash")
    val teams = mapper.readTree(Notify.teamsCardJson(digest, "http://dash"))
    assert(teams.get("@type").asText() === "MessageCard")
    assert(teams.get("sections").get(0).get("facts").size() === 3)
    // error alert payload also valid JSON
    val err = mapper.readTree(Notify.errorSlackJson("boom \"x\"", "2024-01-15 00:00:00"))
    assert(err.get("attachments").get(0).get("color").asText() === "danger")
  }

  test("channel fan-out: one email per recipient + webhook messages, " +
      "content-addressed idKeys") {
    val msgs = Notify.opportunityMessages(digest,
      Seq("a@x.com", " b@x.com ", ""), slack = true, teams = true, "http://dash")
    assert(msgs.map(_.channel) === Seq("email", "email", "slack", "teams"))
    assert(msgs(1).recipient === "b@x.com", "recipients trimmed, blanks dropped")
    assert(msgs.map(_.idKey).distinct.size === 4)
    // same digest re-rendered → same keys (idempotency base)
    val again = Notify.opportunityMessages(digest,
      Seq("a@x.com", "b@x.com"), slack = true, teams = true, "http://dash")
    assert(again.map(_.idKey) === msgs.take(2).map(_.idKey) ++ msgs.drop(2).map(_.idKey))
  }

  test("outbox delivery: retries with backoff, idempotent re-delivery, " +
      "dead-letter on exhaustion without starving other channels") {
    val outbox = java.nio.file.Files.createTempDirectory("graft-outbox").toString
    val msgs = Notify.opportunityMessages(digest,
      Seq("a@x.com"), slack = true, teams = true, "http://dash")
    val sleeps = mutable.Buffer[Long]()
    var slackTries = 0
    val flaky: Notify.Sender = { m =>
      if (m.channel == "slack") { // succeeds on 3rd try
        slackTries += 1
        if (slackTries < 3) throw new RuntimeException("webhook 502")
      } else if (m.channel == "teams") throw new RuntimeException("teams down")
    }
    val r1 = Notify.deliver(msgs, flaky, outbox, maxTries = 3,
      backoffMs = 200, sleepMs = ms => { sleeps += ms; () })
    assert(r1 === Notify.DeliveryReport(sent = 2, skipped = 0, deadLettered = 1))
    assert(sleeps.toSeq === Seq(200L, 400L, 200L, 400L),
      "linear backoff for slack (2 retries) and teams (2 retries)")
    val dl = scala.io.Source.fromFile(s"$outbox/dead_letter.jsonl")
    val dead = try dl.getLines().toList finally dl.close()
    assert(dead.size === 1 && dead.head.contains("teams down"))
    assert(mapper.readTree(dead.head).get("channel").asText() === "teams")

    // re-delivery: already-sent skip, the dead one retries and (sender
    // healthy now) succeeds
    val r2 = Notify.deliver(msgs, _ => (), outbox)
    assert(r2 === Notify.DeliveryReport(sent = 1, skipped = 2, deadLettered = 0))
    // a CHANGED digest (different content hash) sends fresh
    val changed = Notify.opportunityMessages(
      digest.copy(nTotal = digest.nTotal + 1), Seq("a@x.com"),
      slack = false, teams = false, "http://dash")
    assert(Notify.deliver(changed, _ => (), outbox).sent === 1)
  }
}
