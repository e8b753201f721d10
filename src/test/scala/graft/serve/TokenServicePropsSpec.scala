package graft.serve

import org.scalacheck.Gen
import org.scalatest.funsuite.AnyFunSuite

import graft.PropsCases
import graft.serve.ApiShell.TokenService
import graft.sources.ResilientClient.Clock

/** Property gates for the compact-token service: issue→verify round
  * trips for arbitrary subjects/roles, any single-character tampering
  * of any segment is rejected, foreign-secret tokens are rejected, and
  * expiry is exact on a virtual clock. */
class TokenServicePropsSpec extends AnyFunSuite with PropsCases {

  private class VClock(var now: Long = 1700000000000L) extends Clock {
    def nowMs: Long = now
    def sleepMs(ms: Long): Unit = { now += ms }
  }

  // printable-ASCII minus '"' and '\' (the payload is hand-built JSON;
  // the token contract is for identifier-like subjects, not arbitrary
  // JSON-escaping — quotes/backslashes are out of the subject alphabet)
  private val subGen: Gen[String] = Gen.chooseNum(1, 24).flatMap(n =>
    Gen.listOfN(n, Gen.oneOf(
      (('a' to 'z') ++ ('A' to 'Z') ++ ('0' to '9') ++ "._-@+ ").toSeq))
      .map(_.mkString))

  test("issue → verify round-trips arbitrary subject/role pairs") {
    val clock = new VClock
    val svc = new TokenService("s3cret", clock)
    cases(Gen.zip(subGen, subGen), 60).foreach { case (sub, role) =>
      val t = svc.issue(sub, role)
      assert(svc.verify(t) == Right((sub, role)), s"sub=$sub role=$role")
    }
  }

  test("single-character tampering anywhere in the token is rejected") {
    val clock = new VClock
    val svc = new TokenService("s3cret", clock)
    val t = svc.issue("alice", "admin")
    def flip(c: Char): Char = if (c == 'A') 'B' else 'A'
    val tampered = t.indices.filter(i => t(i) != '.').map { i =>
      t.updated(i, flip(t(i)))
    }
    tampered.foreach { bad =>
      assert(svc.verify(bad).isLeft, s"accepted tampered token: $bad")
    }
    // segment deletion / garbage shapes
    assert(svc.verify("").isLeft && svc.verify("a.b").isLeft &&
      svc.verify(t.split('.').take(2).mkString(".")).isLeft)
  }

  test("a token minted under another secret is rejected") {
    val clock = new VClock
    val a = new TokenService("secret-a", clock)
    val b = new TokenService("secret-b", clock)
    cases(subGen, 20).foreach { sub =>
      assert(b.verify(a.issue(sub, "r")).isLeft)
    }
  }

  test("expiry boundary is exact: valid at exp, expired one second past") {
    val clock = new VClock
    val svc = new TokenService("s3cret", clock, expirationHours = 1)
    val t = svc.issue("alice", "admin")
    clock.now += 3600L * 1000 // exactly exp
    assert(svc.verify(t) == Right(("alice", "admin")))
    clock.now += 1000 // one second past
    assert(svc.verify(t) == Left("Token expired"))
  }
}
