package graft

import org.apache.spark.sql.Row
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import graft.functions.ByteLevelBpe
import graft.operators.Bpe

/**
 * Byte-level BPE gates (the GPT-2 lineage — VERDICT r14 #3):
 *  - the byte→unicode table is the published `bytes_to_unicode` mapping,
 *  - non-ASCII input maps per UTF-8 BYTE (no out-of-alphabet sequence
 *    exists — the property that makes production tokenizers byte-level),
 *  - the pretokenizer splits GPT-2-style (case preserved, leading space
 *    in-token) with the documented RE2-compatible whitespace deviation,
 *  - tokenization is a lossless segmentation of the byte-mapped text,
 *  - byte-level counts feed the existing trainers unchanged
 *    (batchSize=1 batched ≡ sequential argmax; partition-invariant),
 *  - SCALE: 1024 byte-level merges in ≪ 1024 rounds on a
 *    wide-vocabulary corpus (the documents table's ~61 distinct
 *    pretokens cap its own merge depth at a few hundred — q200 trains
 *    that corpus to its own depth; THIS gate proves the trainer
 *    sustains production merge counts).
 */
class ByteLevelBpeSpec extends SparkSpec {
  import spark.implicits._

  test("byte→unicode table matches GPT-2 bytes_to_unicode") {
    val t = ByteLevelBpe.ByteToChar
    assert(t(32) == 'Ġ', "space must map to Ġ")     // 256 + 32
    assert(t(10) == 'Ċ', "newline must map to Ċ")   // 256 + 10
    assert(t(9) == 'ĉ', "tab must map to ĉ")        // 256 + 9
    assert(t(0) == 'Ā')                             // 256 + 0
    assert(t(65) == 'A' && t(122) == 'z' && t(33) == '!') // printable kept
    assert(t(126) == '~' && t(127) == 'ġ')          // DEL is 34th gap
    assert(t(255) == 'ÿ' && t(161) == '¡' && t(174) == '®')
    assert(t(173) == 'Ń', "soft hyphen (0xAD) is remapped")
    assert(t.distinct.length == 256, "mapping must be injective")
  }

  test("non-ASCII maps per UTF-8 byte: 'é' → 'Ã©' (the GPT-2 artifact)") {
    assert(ByteLevelBpe.mapBytes("é") == "Ã©") // 0xC3 0xA9 both kept bytes
    assert(ByteLevelBpe.mapBytes(" a\tb") == "Ġaĉb")
    // every byte of a supplementary character maps too (4 UTF-8 bytes)
    assert(ByteLevelBpe.mapBytes("😀").length == 4)
  }

  test("pretokenizer: GPT-2 shape, case preserved, single space attaches " +
      "to the following word; multi-space runs stay one token (documented " +
      "RE2 deviation)") {
    val got = Seq("Hello  world42! x").toDF("text")
      .select(Bpe.byteLevelWords(col("text"))).as[Seq[String]].head()
    assert(got == Seq("Hello", "ĠĠ", "world", "42", "!",
      "Ġx"))
    // contractions split per the GPT-2 suffix alternatives
    val c = Seq("it's Dan'll").toDF("text")
      .select(Bpe.byteLevelWords(col("text"))).as[Seq[String]].head()
    assert(c == Seq("it", "'s", "ĠDan", "'ll"))
  }

  private def docsDf(texts: Seq[String], parts: Int = 3) =
    spark.createDataFrame(
      spark.sparkContext.parallelize(texts.map(Row(_)), parts),
      StructType(Seq(StructField("text", StringType))))

  private val corpus = Seq(
    "the newest widest lower low", "the low lower newest",
    "widest newest newest the", "low low lower the widest newest")

  test("tokenization is a lossless segmentation of the byte-mapped text, " +
      "and training produces multi-byte tokens") {
    val docs = docsDf(corpus)
    val merges = Bpe.trainBatchedRounds(
      Bpe.byteLevelWordCounts(docs, col("text")),
      numRounds = 5, batchSize = 8, minPairCount = 2L).merges
    assert(merges.nonEmpty)
    val check = docs.select(
      concat_ws("", Bpe.encodeByteLevel(col("text"), merges)).as("enc"),
      concat_ws("", Bpe.byteLevelWords(col("text"))).as("mapped"))
    assert(check.filter(col("enc") =!= col("mapped")).count() == 0)
    val maxTok = docs
      .select(explode(Bpe.encodeByteLevel(col("text"), merges)).as("t"))
      .agg(max(length(col("t")))).head.getInt(0)
    assert(maxTok > 1, "training must produce multi-symbol tokens")
  }

  test("decode(encode(x)) == x for every string — the byte-level " +
      "lossless guarantee, incl. non-ASCII, supplementary chars, " +
      "whitespace runs, and untrained symbols") {
    val merges = Seq(("Ġ", "t"), ("h", "e"), ("Ġt", "he"))
    val ranks = new java.util.HashMap[String, Integer]()
    merges.zipWithIndex.foreach { case ((a, b), r) =>
      ranks.put(a + " " + b, r) }
    val cases = Seq(
      "Hello  world42! x", "it's Dan'll", "é résumé naïve",
      "mixed ascii și 中文 😀 end", "  leading and trailing  ",
      "tabs\tand\nnewlines\r\n", "")
    for (x <- cases) {
      val toks = ByteLevelBpe.encode(
        org.apache.spark.unsafe.types.UTF8String.fromString(x), ranks)
      val back = ByteLevelBpe.decode(
        (0 until toks.numElements()).map(i =>
          toks.getUTF8String(i).toString))
      assert(back == x, s"roundtrip broke for '$x' -> '$back'")
    }
    // deterministic random strings over a wide codepoint range
    val rnd = new scala.util.Random(7L)
    for (_ <- 0 until 50) {
      val x = new String((0 until 40).flatMap { _ =>
        Character.toChars(rnd.nextInt(0x2FFF) match {
          case c if Character.isDefined(c) && !Character.isSurrogate(c.toChar) => c
          case _ => 'a'.toInt
        })
      }.toArray)
      val toks = ByteLevelBpe.encode(
        org.apache.spark.unsafe.types.UTF8String.fromString(x), ranks)
      val back = ByteLevelBpe.decode(
        (0 until toks.numElements()).map(i =>
          toks.getUTF8String(i).toString))
      assert(back == x)
    }
  }

  test("byte-level counts feed the trainers unchanged: batchSize=1 " +
      "reduces to the sequential argmax; merges partition-invariant") {
    val seqMerges = Bpe.trainFromCounts(
      Bpe.byteLevelWordCounts(docsDf(corpus), col("text")),
      numMerges = 6, minPairCount = 2L)
    for (parts <- Seq(1, 4)) {
      val batched = Bpe.trainBatchedRounds(
        Bpe.byteLevelWordCounts(docsDf(corpus, parts), col("text")),
        numRounds = 6, batchSize = 1, minPairCount = 2L)
      assert(batched.merges == seqMerges)
    }
  }

  test("scale: 1024 byte-level merges in far fewer than 1024 rounds " +
      "(wide-vocabulary corpus incl. non-ASCII)") {
    val rnd = new scala.util.Random(42L)
    val alphabet = "abcdefghé" // é forces real multi-byte mapping paths
    val words = (0 until 800).map { _ =>
      Array.fill(10 + rnd.nextInt(7))(
        alphabet(rnd.nextInt(alphabet.length))).mkString
    }.distinct
    val docs = docsDf(words.grouped(8).map(_.mkString(" ")).toSeq, 4)
    // batchSize 128 (vs q192's 64): every pretoken starts with the SAME
    // Ġ symbol, so early rounds reject most of a narrow window — a wider
    // window keeps the disjoint yield per round high
    val res = Bpe.trainBatched(
      Bpe.byteLevelWordCounts(docs, col("text")),
      numMerges = 1024, batchSize = 128, minPairCount = 1L)
    assert(res.merges.size == 1024,
      s"corpus exhausted at ${res.merges.size} merges")
    // ≤160 (vs the word-level gate's 128): byte-level has a STRUCTURAL
    // round throttle word-level lacks — every pretoken starts with Ġ, so
    // the disjointness screen admits at most ONE Ġ-pair per round, and
    // Ġ-pairs are among the highest-count candidates in every round.
    // 1024 merges in ~140 rounds is still a 7× round reduction; the
    // per-merge sequential trainer would be 1024 driver round-trips.
    assert(res.rounds <= 160,
      s"expected <= 160 rounds for 1024 merges, got ${res.rounds}")
  }
}
