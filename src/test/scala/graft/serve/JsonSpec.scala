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

  test("escape emits the named forms for the common controls") {
    assert(Json.escape("a\nb\tc\"d\\e") == """a\nb\tc\"d\\e""")
    assert(Json.escape("") == "\\u0001")
  }
}
