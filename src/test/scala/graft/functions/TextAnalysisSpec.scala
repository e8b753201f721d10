package graft.functions

import graft.SparkSpec
import org.apache.spark.sql.functions._

class TextAnalysisSpec extends SparkSpec {
  import TextAnalysis._

  private def one(c: org.apache.spark.sql.Column): Any =
    spark.range(1).select(c).head.get(0)

  test("token counts: whitespace and BPE-ish") {
    assert(one(tokenCount(lit("the  quick, brown fox!"))) == 4)
    // runs: [the][quick][,][brown][fox][!]
    assert(one(bpeTokenCount(lit("the quick, brown fox!"))) == 6)
    assert(one(tokenCount(lit(""))) == 0)
  }

  test("languageId: stopword profiles and CJK") {
    assert(one(languageId(lit("the cat is on the mat and it is happy"))) == "en")
    assert(one(languageId(lit("der hund ist gross und die katze ist klein"))) == "de")
    assert(one(languageId(lit("el perro es grande y la casa es bonita"))) == "es")
    assert(one(languageId(lit("你好世界"))) == "zh")
    assert(one(languageId(lit("xyzzy plugh frobozz"))) == "und")
  }

  test("languageId tie-break: earlier profile wins") {
    // "de" ∈ es-profile? no. Construct tie: "la" is in both es and fr profiles
    assert(one(languageId(lit("la la la"))) == "es")
  }

  test("qualityScore: clean prose scores higher than garbage") {
    val clean = one(qualityScore(lit(
      "the quick brown fox jumps over the lazy dog and it is a fine day in the park")))
      .asInstanceOf[Double]
    val junk = one(qualityScore(lit("@@## $$%% ^^&& !!||"))).asInstanceOf[Double]
    assert(clean > 0.6)
    assert(junk < 0.4)
    assert(clean <= 1.0 && junk >= 0.0)
  }

  test("contentFingerprint stable under token reordering") {
    val r = spark.range(1).select(
      contentFingerprint(lit("alpha beta gamma")).as("a"),
      contentFingerprint(lit("gamma alpha beta")).as("b"),
      contentFingerprint(lit("alpha beta delta")).as("c")).head
    assert(r.getString(0) == r.getString(1))
    assert(r.getString(0) != r.getString(2))
  }
}
