package graft.functions

import graft.SparkSpec
import org.apache.spark.sql.functions._

/**
 * Fixtures mirror the reference's behavior (reference:
 * src/ml/entity_resolution.py:52-196); expected values hand-traced from the
 * Python (lower → punct→space → split → abbrev-expand → suffix-drop → join).
 */
class TextFunctionsSpec extends SparkSpec {
  import TextFunctions._
  import spark.implicits._

  private def one(c: org.apache.spark.sql.Column): Any =
    spark.range(1).select(c).head.get(0)

  test("nameNormalize: punctuation, abbrevs, suffixes") {
    // "Acme Corp." → "acme corp " → ["acme","corp"] → expand corp→corporation
    // → corporation is a suffix → dropped → "acme"
    assert(one(nameNormalize(lit("Acme Corp."))) == "acme")
    // tech → technology (expanded, not a suffix)
    assert(one(nameNormalize(lit("Global-Tech Intl"))) == "technology")
    // & survives
    assert(one(nameNormalize(lit("Johnson & Johnson Inc"))) == "johnson & johnson")
    assert(one(nameNormalize(lit(null).cast("string"))) == "")
  }

  test("nameTokens: len>2, distinct") {
    val toks = one(nameTokens(lit("Big Data Co of Big Things")))
      .asInstanceOf[scala.collection.Seq[String]].toSeq
    // co→company→suffix dropped; "of" len 2 dropped; "big" deduped
    assert(toks == Seq("big", "data", "things"))
  }

  test("extractDomain: email, url, www, path") {
    assert(one(extractDomain(lit("john@Example.COM"))) == "example.com")
    assert(one(extractDomain(lit("https://www.acme.co.uk/about"))) == "acme.co.uk")
    assert(one(extractDomain(lit("www.foo.io"))) == "foo.io")
    assert(one(extractDomain(lit("bar.com/path/x"))) == "bar.com")
    assert(one(extractDomain(lit(null).cast("string"))) == null)
  }

  test("rootDomain: last two labels") {
    assert(one(rootDomain(lit("a.b.acme.com"))) == "acme.com")
    assert(one(rootDomain(lit("acme.com"))) == "acme.com")
  }

  test("blockingKey: 3+3 prefix") {
    assert(one(blockingKey(lit("Microsoft Corporation"), lit("United States"))) == "mic_uni")
    // short normalized names keep what exists
    assert(one(blockingKey(lit("AB Inc"), lit("DE"))) == "ab_de")
  }

  test("jaccardTokens") {
    val j = one(jaccardTokens(array(lit("a"), lit("b"), lit("c")),
      array(lit("b"), lit("c"), lit("d")))).asInstanceOf[Double]
    assert(math.abs(j - 0.5) < 1e-12)
    assert(one(jaccardTokens(array(), array(lit("x")))) == 0.0)
  }

  test("levenshteinSim") {
    val v = one(levenshteinSim(lit("kitten"), lit("sitting"))).asInstanceOf[Double]
    assert(math.abs(v - (1.0 - 3.0 / 7.0)) < 1e-12)
    assert(one(levenshteinSim(lit(""), lit("x"))) == 0.0)
  }

  test("charShingles / wordNgrams") {
    val sh = one(charShingles(lit("abcd"), 3)).asInstanceOf[scala.collection.Seq[String]].toSeq
    assert(sh == Seq("abc", "bcd"))
    val ng = one(wordNgrams(lit("the quick brown fox"), 2)).asInstanceOf[scala.collection.Seq[String]].toSeq
    assert(ng == Seq("the quick", "quick brown", "brown fox"))
  }

  test("vector functions: dot / norm / cosine") {
    import VectorFunctions._
    val a = array(lit(1.0f), lit(2.0f), lit(2.0f))
    val b = array(lit(2.0f), lit(4.0f), lit(4.0f))
    assert(one(dot(a, b)) == 18.0)
    assert(one(norm(a)) == 3.0)
    assert(math.abs(one(cosine(a, b)).asInstanceOf[Double] - 1.0) < 1e-12)
    assert(one(cosine(a, array(lit(0.0f), lit(0.0f), lit(0.0f)))) == null)
  }
}
