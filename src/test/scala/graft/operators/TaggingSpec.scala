package graft.operators

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** Contract gates for [[Tagging.tagPhrases]] (q181's operator): presence
  * semantics, phrase-length cap, case/whitespace normalization, and
  * partition invariance — the dictionary-tagging guarantees the
  * blocklist/taxonomy use cases rely on. */
class TaggingSpec extends SparkSpec {

  private lazy val sq = spark
  import sq.implicits._

  private def dict = Seq(
    ("hash join", "joins"),
    ("JOIN", "joins"), // dictionary side is lowercased too
    ("scan", "scans"),
    ("full table scan", "scans") // 3 words — beyond maxPhraseLen=2
  ).toDF("phrase", "category")

  test("presence semantics: a phrase occurring many times counts ONCE; " +
      "distinct phrases of one category accumulate") {
    val docs = Seq(
      (1L, "scan scan scan scan"), // 'scan' x4 -> 1
      (2L, "hash join then a join"), // two distinct joins phrases -> 2
      (3L, "nothing relevant here")
    ).toDF("doc_id", "text")
    val out = Tagging.tagPhrases(docs, col("doc_id"), col("text"), dict, 2)
      .orderBy("id", "category")
      .as[(Long, String, Long)].collect().toSeq
    assert(out === Seq((1L, "scans", 1L), (2L, "joins", 2L)))
  }

  test("maxPhraseLen caps the gram generation: a 3-word dictionary " +
      "phrase can NEVER match at maxPhraseLen=2, and matches at 3") {
    val docs = Seq((1L, "a full table scan happened")).toDF("doc_id", "text")
    val at2 = Tagging.tagPhrases(docs, col("doc_id"), col("text"),
        dict.filter(col("phrase") === "full table scan"), 2).count()
    assert(at2 === 0L)
    val at3 = Tagging.tagPhrases(docs, col("doc_id"), col("text"),
        dict.filter(col("phrase") === "full table scan"), 3)
      .as[(Long, String, Long)].collect().toSeq
    assert(at3 === Seq((1L, "scans", 1L)))
  }

  test("normalization: matching is lowercase on BOTH sides and " +
      "whitespace-split (multi-space and newline separators)") {
    val docs = Seq((1L, "HASH   JOIN\nSCAN")).toDF("doc_id", "text")
    val out = Tagging.tagPhrases(docs, col("doc_id"), col("text"), dict, 2)
      .orderBy("category").as[(Long, String, Long)].collect().toSeq
    // 'hash join' (across the multi-space), 'join' (uppercase dict
    // entry lowercased), 'scan'
    assert(out === Seq((1L, "joins", 2L), (1L, "scans", 1L)))
  }

  test("dictionary whitespace is normalized: double-space / tab / " +
      "newline taxonomy rows match the single-space grams") {
    val docs = Seq((1L, "a hash join happened")).toDF("doc_id", "text")
    val messy = Seq(("hash  join", "joins"), ("hash\tjoin", "joins"),
      ("  hash join  ", "joins")).toDF("phrase", "category")
    val out = Tagging.tagPhrases(docs, col("doc_id"), col("text"), messy, 2)
      .as[(Long, String, Long)].collect().toSeq
    // all three rows normalize to the SAME phrase -> distinct'd to one
    assert(out === Seq((1L, "joins", 1L)))
  }

  test("duplicate dictionary rows collapse (distinct'd) — no double " +
      "counting from a redundant taxonomy") {
    val docs = Seq((1L, "scan it")).toDF("doc_id", "text")
    val dup = dict.union(dict)
    val out = Tagging.tagPhrases(docs, col("doc_id"), col("text"), dup, 2)
      .as[(Long, String, Long)].collect().toSeq
    assert(out === Seq((1L, "scans", 1L)))
  }

  test("partition invariance: 1-partition and 7-partition inputs " +
      "produce identical tag frames") {
    val docs = Tables400()
    val a = Tagging.tagPhrases(docs.repartition(1), col("doc_id"),
        col("text"), dict, 2)
      .orderBy("id", "category").collect().toSeq
    val b = Tagging.tagPhrases(docs.repartition(7), col("doc_id"),
        col("text"), dict, 2)
      .orderBy("id", "category").collect().toSeq
    assert(a === b && a.nonEmpty)
  }

  test("tagPhrasesKernel ≡ tagPhrases: the codegen kernel and the " +
      "explode+broadcast-join form produce the SAME frame on real " +
      "documents (messy dictionary included)") {
    val docs = Tables400()
    val dictRows = Seq(
      ("hash join", "joins"), ("JOIN", "joins"), ("scan", "scans"),
      ("fast", "perf"), ("slow  query", "perf"), // double space
      ("scan", "ops") // one phrase, second category
    )
    val a = Tagging.tagPhrases(docs, col("doc_id"), col("text"),
        dictRows.toDF("phrase", "category"), 2)
      .orderBy("id", "category").collect().toSeq
    val b = Tagging.tagPhrasesKernel(docs, col("doc_id"), col("text"),
        dictRows, 2)
      .orderBy("id", "category").collect().toSeq
    assert(a === b && a.nonEmpty)
  }

  test("kernel ≡ join form beyond ASCII: UTF8String lowercasing on " +
      "BOTH paths (Turkish dotted I, long s, sigma)") {
    // Java toLowerCase(ROOT) maps \u0130 to i + combining dot (TWO code
    // points) while UTF8String.toLowerCase (Spark's lower()) maps it to
    // a single char — before r14 the kernel used the former and could
    // tag differently from the join form on such text. Pin parity on
    // the exact characters that diverge.
    val docs = Seq(
      (1L, "\u0130stanbul b\u00fcy\u00fck \u015fehir"), // İstanbul
      (2L, "wa\u017fer etching basics"),                   // ſ (long s)
      (3L, "\u03a3\u03bf\u03c6\u03cc\u03c2 plan")      // Σοφός
    ).toDF("doc_id", "text")
    val dictRows = Seq(
      ("\u0130stanbul", "city"), ("istanbul", "city2"),
      ("wa\u017fer etching", "fab"), ("wafer", "fab2"),
      ("\u03c3\u03bf\u03c6\u03cc\u03c2", "wise"))
    val a = Tagging.tagPhrases(docs, col("doc_id"), col("text"),
        dictRows.toDF("phrase", "category"), 2)
      .orderBy("id", "category").collect().toSeq
    val b = Tagging.tagPhrasesKernel(docs, col("doc_id"), col("text"),
        dictRows, 2)
      .orderBy("id", "category").collect().toSeq
    assert(a === b)
    // and the matching itself is real: the lowercased-dict entries hit
    val cats = b.map(_.getString(1)).toSet
    assert(cats.contains("fab"), s"long-s phrase must match (got $cats)")
  }

  test("PhraseHits returns sorted DISTINCT indices; repeated phrase " +
      "occurrences count once; maxLen caps the probe") {
    import org.apache.spark.sql.graftshim.GraftShim
    val phrases = Seq("b c", "a", "z", "a b c")
    def hits(text: String, maxLen: Int): Seq[Int] = {
      Seq(text).toDF("t")
        .select(GraftShim.column(graft.functions.PhraseHits(
          GraftShim.expr(col("t")), phrases, maxLen)).as("h"))
        .as[Seq[Int]].head()
    }
    // 'a' twice -> once; 'b c' and 'a b c' both present; sorted output
    assert(hits("a b c a", 3) === Seq(0, 1, 3))
    // maxLen 2 can no longer see the 3-gram
    assert(hits("a b c a", 2) === Seq(0, 1))
    // case + whitespace normalization on the TEXT side
    assert(hits("A   B\nC", 3) === Seq(0, 1, 3))
    assert(hits("nothing here", 3) === Seq())
  }

  private def Tables400() =
    graft.sources.Tables.load(spark, "/root/testdata/sf0.001", "documents")
      .select(col("doc_id"), col("text")).limit(400)
}
