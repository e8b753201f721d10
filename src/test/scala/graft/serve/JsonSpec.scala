package graft.serve

import org.scalatest.funsuite.AnyFunSuite

/** The shared serve-layer JSON string escape/unescape pair: roundtrip
  * totality and the client-emitted escape forms an adapter must decode. */
class JsonSpec extends AnyFunSuite {

  test("escape/unescape roundtrips every escape class") {
    val s = "a\"b\\c\nd\te\rf\bg\fhi é 漢 "
    assert(Json.unescape(Json.escape(s)) == s)
  }

  test("unescape decodes the standard named escapes and \\uXXXX") {
    assert(Json.unescape("""line1\nline2\tA\\\"""") ==
      "line1\nline2\tA\\\"")
    assert(Json.unescape("""a\/b""") == "a/b") // lenient: \X -> X
    assert(Json.unescape("\\u0041") == "A")
  }

  test("unescape is lenient on malformed \\u escapes (never throws)") {
    // an untrusted client body with \uZZZZ must surface as a 4xx-able
    // parse, not a NumberFormatException → 500 through the catch-all
    // "\\u" built by concat: the Scala lexer would otherwise eat \uXXXX
    assert(Json.unescape("a\\" + "uZZZZb") == "auZZZZb")
    assert(Json.unescape("\\" + "u12G4") == "u12G4")
    assert(Json.unescape("tail\\" + "u12") == "tailu12") // truncated
    assert(Json.unescape("okA\\" + "uXYXY") == "okAuXYXY")
  }

  test("escape emits the named forms for the common controls") {
    assert(Json.escape("a\nb\tc\"d\\e") == """a\nb\tc\"d\\e""")
    assert(Json.escape("") == "\\u0001")
  }
}
