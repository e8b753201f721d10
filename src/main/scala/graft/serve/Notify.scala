package graft.serve

import org.apache.spark.sql.{DataFrame, Row}

/**
 * Notification delivery — the reference's multi-channel alert layer
 * (reference: src/utils/notifications.py — channel fan-out :39-71,
 * error alert :73-117, opportunity HTML :120-172, plain text :174-197,
 * Slack blocks :231-271, SMTP/webhook senders :199-229) realized with a
 * PLUGGABLE sender (`Message => Unit`) and a durable file OUTBOX: this
 * container has no SMTP/webhook egress, and the part of a notifier that
 * carries correctness weight — what renders, what retries, what
 * delivers exactly once per digest — is transport-independent.
 *
 * Deliberate semantic upgrade over the reference: notifications.py
 * fire-and-forgets (`gather(return_exceptions=True)` drops failures on
 * the floor — an alert that matters most when infra is flaky is the
 * first thing lost). Here delivery is AT-LEAST-ONCE with idempotency
 * markers: a message's `idKey` is a content hash, a marker file in the
 * outbox records success, re-delivery of an already-sent digest is a
 * skip, and a message that exhausts its retries lands in
 * `dead_letter.jsonl` with its error — auditable, replayable.
 *
 * Scale: the digest is a TOP-N serving artifact (n_total/total_value
 * computed distributed in [[Serve.notifyDigest]]); rendering and
 * delivery touch only those N collected rows. The outbox is a plain
 * directory so the idempotency state survives process restarts and is
 * inspectable with `ls`.
 */
object Notify {

  final case class Opportunity(account1: String, account2: String,
                               score: Double, estimatedValue: Double,
                               nextBestAction: String)

  /** The rendered digest input: headline stats + the top rows every
    * channel's body interpolates. */
  final case class Digest(nTotal: Long, totalValue: Double,
                          top: Seq[Opportunity])

  /** Collect a [[Serve.notifyDigest]]-shaped frame (rank, a/b ids,
    * score, estimated_value, next_best_action, n_total, total_value)
    * into a [[Digest]]. The frame is the already-capped top-N — the
    * collect is N rows by construction. */
  def digestOf(df: DataFrame): Digest = {
    val rows: Seq[Row] = df.orderBy("rank").collect().toSeq
    val ops = rows.map { r =>
      Opportunity(
        r.getAs[Any]("a_id").toString, r.getAs[Any]("b_id").toString,
        r.getAs[Number]("score").doubleValue(),
        r.getAs[Number]("estimated_value").doubleValue(),
        r.getAs[String]("next_best_action"))
    }
    if (rows.isEmpty) Digest(0L, 0.0, Nil)
    else Digest(rows.head.getAs[Number]("n_total").longValue(),
      rows.head.getAs[Number]("total_value").doubleValue(), ops)
  }

  private def money(v: Double): String = {
    // the reference's ${:,.0f}
    val s = math.round(v).toString
    "$" + s.reverse.grouped(3).mkString(",").reverse
  }
  private def score2(v: Double): String = f"$v%.2f" // {:.2f}

  // quotes included: the escape is used inside double-quoted attribute
  // values (the dashboard href), where an unescaped '"' breaks out of
  // the attribute — config-sourced strings must not inject markup
  private def htmlEscape(s: String): String = s
    .replace("&", "&amp;").replace("<", "&lt;").replace(">", "&gt;")
    .replace("\"", "&quot;").replace("'", "&#39;")
  private def jsonEscape(s: String): String = s.flatMap {
    case '"' => "\\\""
    case '\\' => "\\\\"
    case '\n' => "\\n"
    case '\r' => "\\r"
    case '\t' => "\\t"
    case c if c < ' ' => f"\\u${c.toInt}%04x"
    case c => c.toString
  }

  /** Email subject (reference :44). */
  def subject(d: Digest): String =
    s"${d.nTotal} New High-Value Cross-Sell Opportunities"

  /** Opportunity email HTML — the reference's structure (:120-172):
    * headline count + total value, a top-5 table (account1, account2,
    * score 2dp, $value, next action), dashboard link. */
  def emailHtml(d: Digest, dashboardUrl: String): String = {
    val rows = d.top.map { o =>
      s"<tr><td>${htmlEscape(o.account1)}</td><td>${htmlEscape(o.account2)}</td>" +
        s"<td>${score2(o.score)}</td><td>${money(o.estimatedValue)}</td>" +
        s"<td>${htmlEscape(o.nextBestAction)}</td></tr>"
    }.mkString
    s"""<html><body><h2>New Cross-Sell Opportunities Identified</h2>
       |<p>We've identified <strong>${d.nTotal}</strong> new high-value cross-sell
       |opportunities with a total potential value of <strong>${money(d.totalValue)}</strong>.</p>
       |<h3>Top ${d.top.size} Opportunities:</h3>
       |<table><thead><tr><th>Account 1</th><th>Account 2</th><th>Score</th>
       |<th>Est. Value</th><th>Next Action</th></tr></thead>
       |<tbody>$rows</tbody></table>
       |<p><a href="${htmlEscape(dashboardUrl)}">View All Opportunities</a></p>
       |</body></html>""".stripMargin
  }

  /** Plain-text alternative (reference :174-197). */
  def emailText(d: Digest, dashboardUrl: String): String = {
    val items = d.top.zipWithIndex.map { case (o, i) =>
      s"${i + 1}. ${o.account1} x ${o.account2}\n" +
        s"   Score: ${score2(o.score)} | Value: ${money(o.estimatedValue)}\n" +
        s"   Action: ${o.nextBestAction}"
    }.mkString("\n")
    s"""New Cross-Sell Opportunities Identified
       |
       |We've identified ${d.nTotal} new high-value cross-sell opportunities
       |with a total potential value of ${money(d.totalValue)}.
       |
       |Top ${d.top.size} Opportunities:
       |$items
       |
       |View all opportunities: $dashboardUrl""".stripMargin
  }

  /** Slack Block Kit payload (reference :231-271): header + summary
    * section + one section per top-3 opportunity with a dashboard
    * button. */
  def slackBlocksJson(d: Digest, dashboardUrl: String): String = {
    val header =
      s"""{"type":"header","text":{"type":"plain_text","text":"${jsonEscape(subject(d))}"}}"""
    val summary =
      s"""{"type":"section","text":{"type":"mrkdwn","text":"Total opportunities: *${d.nTotal}*\\nTotal value: *${money(d.totalValue)}*"}}"""
    val tops = d.top.take(3).map { o =>
      s"""{"type":"section","text":{"type":"mrkdwn","text":"*${jsonEscape(o.account1)}* x *${jsonEscape(o.account2)}*\\nScore: ${score2(o.score)} | Value: ${money(o.estimatedValue)}"},"accessory":{"type":"button","text":{"type":"plain_text","text":"View Details"},"url":"${jsonEscape(dashboardUrl)}"}}"""
    }
    (Seq(header, summary) ++ tops).mkString("""{"blocks":[""", ",", "]}")
  }

  /** Teams MessageCard payload (reference _send_teams — same facts in
    * the card grammar). */
  def teamsCardJson(d: Digest, dashboardUrl: String): String = {
    val facts = d.top.take(3).map { o =>
      s"""{"name":"${jsonEscape(o.account1)} x ${jsonEscape(o.account2)}","value":"Score ${score2(o.score)} | ${jsonEscape(money(o.estimatedValue))}"}"""
    }.mkString(",")
    s"""{"@type":"MessageCard","summary":"${jsonEscape(subject(d))}","title":"${jsonEscape(subject(d))}","sections":[{"text":"${d.nTotal} opportunities, total ${jsonEscape(money(d.totalValue))}","facts":[$facts]}],"potentialAction":[{"@type":"OpenUri","name":"View All","targets":[{"os":"default","uri":"${jsonEscape(dashboardUrl)}"}]}]}"""
  }

  /** Error alert bodies (reference :73-117): plain text + a danger-color
    * Slack attachment. `at` injected for determinism (reference stamps
    * now()). */
  def errorText(error: String, at: String): String =
    s"Pipeline Error at $at: $error"
  def errorSlackJson(error: String, at: String): String =
    s"""{"text":"Cross-Sell Pipeline Error","attachments":[{"color":"danger","fields":[{"title":"Error","value":"${jsonEscape(s"$at $error")}","short":false}]}]}"""

  final case class Message(channel: String, recipient: String,
                           subject: String, body: String) {
    /** Idempotency key: content-addressed, so re-rendering the same
      * digest for the same recipient dedups and a CHANGED digest sends. */
    lazy val idKey: String = {
      val md = java.security.MessageDigest.getInstance("SHA-256")
      md.update(s"$channel|$recipient|$subject|$body"
        .getBytes(java.nio.charset.StandardCharsets.UTF_8))
      md.digest().map("%02x".format(_)).mkString.take(32)
    }
  }

  /** Channel fan-out (reference :52-70): one email per recipient plus
    * optional slack/teams webhook messages. */
  def opportunityMessages(d: Digest, emailRecipients: Seq[String],
                          slack: Boolean, teams: Boolean,
                          dashboardUrl: String): Seq[Message] = {
    val subj = subject(d)
    emailRecipients.filter(_.nonEmpty).map(r =>
      Message("email", r.trim, subj, emailHtml(d, dashboardUrl))) ++
      (if (slack) Seq(Message("slack", "webhook", subj,
        slackBlocksJson(d, dashboardUrl))) else Nil) ++
      (if (teams) Seq(Message("teams", "webhook", subj,
        teamsCardJson(d, dashboardUrl))) else Nil)
  }

  /** Error-alert fan-out (reference :92-117: admin emails + a danger
    * Slack attachment). */
  def errorMessages(error: String, at: String, adminEmails: Seq[String],
                    slack: Boolean): Seq[Message] =
    adminEmails.filter(_.nonEmpty).map(r =>
      Message("email", r.trim, "Cross-Sell Pipeline Error",
        errorText(error, at))) ++
      (if (slack) Seq(Message("slack", "webhook",
        "Cross-Sell Pipeline Error", errorSlackJson(error, at))) else Nil)

  /** The pluggable delivery edge; throw to signal failure. Production
    * wraps SMTP/webhook calls (optionally through
    * [[graft.sources.ResilientClient]] for webhook retry/backoff). */
  type Sender = Message => Unit

  final case class DeliveryReport(sent: Int, skipped: Int, deadLettered: Int)

  /**
   * At-least-once delivery with an idempotency outbox:
   *  - `<outbox>/<idKey>.sent` marker ⇒ already delivered, skip;
   *  - otherwise try the sender up to `maxTries` with linear backoff via
   *    `sleepMs` (injected for test determinism);
   *  - success ⇒ write the marker (message metadata inside, so the
   *    outbox doubles as a send audit log);
   *  - exhaustion ⇒ append to `<outbox>/dead_letter.jsonl` and continue
   *    with the remaining messages (one bad channel must not starve the
   *    others — the reference's gather(return_exceptions) intent, kept,
   *    but RECORDED instead of dropped).
   */
  def deliver(msgs: Seq[Message], sender: Sender, outboxDir: String,
              maxTries: Int = 3, backoffMs: Long = 200,
              sleepMs: Long => Unit = Thread.sleep): DeliveryReport = {
    val dir = new java.io.File(outboxDir)
    dir.mkdirs()
    var sent = 0; var skipped = 0; var dead = 0
    msgs.foreach { m =>
      val marker = new java.io.File(dir, s"${m.idKey}.sent")
      if (marker.exists()) skipped += 1
      else {
        var attempt = 1
        var done = false
        var lastErr = ""
        while (!done && attempt <= maxTries) {
          try { sender(m); done = true }
          catch { case e: Exception =>
            lastErr = Option(e.getMessage).getOrElse(e.getClass.getName)
            if (attempt < maxTries) sleepMs(backoffMs * attempt)
            attempt += 1
          }
        }
        // BOOKKEEPING failures (marker or dead-letter write) are scoped
        // per message, like send failures: one unwritable outbox entry
        // must not starve the remaining channels. A sent-but-unmarked
        // message re-sends on the next run — exactly the at-least-once
        // contract the marker already implies.
        if (done) {
          try {
            val w = new java.io.PrintWriter(marker, "UTF-8")
            try w.println(s"""{"channel":"${m.channel}","recipient":"${jsonEscape(m.recipient)}","subject":"${jsonEscape(m.subject)}"}""")
            finally w.close()
          } catch { case _: Exception => () } // delivered; marker best-effort
          sent += 1
        } else {
          try {
            val dl = new java.io.OutputStreamWriter(
              new java.io.FileOutputStream(
                new java.io.File(dir, "dead_letter.jsonl"), true),
              java.nio.charset.StandardCharsets.UTF_8)
            try dl.write(s"""{"idKey":"${m.idKey}","channel":"${m.channel}","recipient":"${jsonEscape(m.recipient)}","subject":"${jsonEscape(m.subject)}","error":"${jsonEscape(lastErr)}","attempts":$maxTries}""" + "\n")
            finally dl.close()
          } catch { case _: Exception => () } // exhausted either way
          dead += 1
        }
      }
    }
    DeliveryReport(sent, skipped, dead)
  }
}
