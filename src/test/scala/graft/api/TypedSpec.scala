package graft.api

import graft.SparkSpec

/** Typed façade: case-class in/out, same results as the untyped path. */
class TypedSpec extends SparkSpec {
  import spark.implicits._
  import Typed._

  private def acct(id: String, name: String, site: String,
                   country: String): Account =
    Account(id, name, Some(site), Some(country), Some("Tech"), Some(100.0))

  test("typed resolve finds the exact-match pair with typed output") {
    val a = Seq(
      acct("1", "Acme Corp", "www.acme.com", "USA"),
      acct("2", "Zenith Ltd", "zenith.io", "USA")).toDS()
    val b = Seq(
      acct("10", "Acme Corporation", "acme.com", "USA"),
      acct("20", "Other Co", "other.net", "FRA")).toDS()
    val out: Seq[MatchResult] = resolve(a, b).collect().toSeq
    val exact = out.filter(_.match_type == "exact")
    assert(exact.map(m => (m.account1_id, m.account2_id)) === Seq(("1", "10")))
    assert(exact.head.match_score === 1.0)
    assert(exact.head.confidence === "high")
    assert(exact.head.match_reasons === Seq("Exact domain and name match"))
  }

  test("typed path output equals untyped resolve on the same input") {
    val a = Seq(acct("1", "Acme Corp", "www.acme.com", "USA")).toDS()
    val b = Seq(acct("10", "Acme Inc", "acme.com", "USA")).toDS()
    val typed = resolve(a, b).toDF()
    val untyped = graft.operators.EntityResolution.resolve(a.toDF(), b.toDF())
    assert(typed.except(untyped).isEmpty && untyped.except(typed).isEmpty)
  }
}
