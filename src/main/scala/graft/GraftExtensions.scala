package graft

import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo}

import graft.functions._

/**
 * Spark-native library entry point: registers every custom Catalyst
 * expression as a SQL function via `SparkSessionExtensions`, so a cluster
 * user gets the whole kernel surface with
 *
 *   spark.sql.extensions=graft.GraftExtensions
 *
 * (or `.withExtensions(new GraftExtensions)` in code) and can write
 * `SELECT jaro_winkler(a, b)`, `minhash_signature(text, 5, 16)`, … from
 * pure SQL, notebooks, or JDBC. This is the standard extension-library
 * pattern (same mechanism Delta/Iceberg use); no session-state mutation,
 * no temp-function lifetime issues — the registrations live in the
 * session build.
 */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(ext: SparkSessionExtensions): Unit = {
    GraftExtensions.injections.foreach(ext.injectFunction)
    // plan-level rewrites: naive range-join predicates → binned equi-join
    // (graft.plans.AutoBinRangeJoin scaladoc; disable with
    // spark.graft.binRangeJoin.enabled=false)
    ext.injectOptimizerRule(_ => graft.plans.AutoBinRangeJoin)
  }
}

object GraftExtensions {

  private def info(name: String, usage: String): ExpressionInfo =
    new ExpressionInfo(classOf[GraftExtensions].getName, null, name, usage,
      "", "", "", "", "", "", "scala_udf")

  /** Clean analysis-time error instead of an opaque eval()/cast failure
    * deep in plan building — names the function and expected signature. */
  private def fail(sig: String, why: String): Nothing =
    throw new org.apache.spark.sql.AnalysisException(
      errorClass = "_LEGACY_ERROR_TEMP_1332",
      messageParameters = Map("errorMessage" -> s"$sig: $why"))

  private def checkArity(sig: String, es: Seq[Expression], n: Int): Unit =
    if (es.length != n)
      fail(sig, s"expects $n arguments, got ${es.length}")

  private def stringLit(sig: String, es: Seq[Expression], i: Int): String = {
    val e = es(i)
    if (!e.foldable)
      fail(sig, s"argument ${i + 1} must be a foldable string literal, " +
        s"got ${e.sql}")
    e.eval() match {
      case s: org.apache.spark.unsafe.types.UTF8String => s.toString
      case s: String => s
      case other =>
        fail(sig, s"argument ${i + 1} must be a string literal, " +
          s"got ${if (other == null) "NULL" else other.toString}")
    }
  }

  private def intLit(sig: String, es: Seq[Expression], i: Int): Int = {
    val e = es(i)
    if (!e.foldable)
      fail(sig, s"argument ${i + 1} must be a foldable integer literal, " +
        s"got ${e.sql}")
    e.eval() match {
      case n: Number => n.intValue()
      case other =>
        fail(sig, s"argument ${i + 1} must be an integer literal, " +
          s"got ${if (other == null) "NULL" else other.toString}")
    }
  }

  /** The full kernel surface as injectable (identifier, info, builder)
    * triples — shared by the extensions path and [[registerAll]]. */
  lazy val injections: Seq[(FunctionIdentifier, ExpressionInfo,
      Seq[Expression] => Expression)] = {
    def arity(sig: String, n: Int)(build: Seq[Expression] => Expression)
        : Seq[Expression] => Expression =
      es => { checkArity(sig, es, n); build(es) }
    // shared 'a b;c d;...' merge-list literal parser (arg index 1)
    def parseMerges(sig: String, es: Seq[Expression]): Seq[(String, String)] =
      stringLit(sig, es, 1).split(";").toSeq
        .filter(_.nonEmpty).map { m =>
          val ab = m.split(" ", 2)
          if (ab.length != 2 || ab(0).isEmpty || ab(1).isEmpty)
            fail(sig, s"bad merge entry '$m' (want 'a b;c d;...')")
          (ab(0), ab(1))
        }
    val fns: Seq[(String, String, Seq[Expression] => Expression)] = Seq(
      ("jaro_winkler", "jaro_winkler(a, b) - reference Jaro-Winkler similarity",
        arity("jaro_winkler(a, b)", 2)(es => JaroWinkler(es.head, es(1)))),
      ("array_dot", "array_dot(a, b) - double-precision dot product",
        arity("array_dot(a, b)", 2)(es => ArrayDot(es.head, es(1)))),
      ("array_unit", "array_unit(a) - v/||v|| (null on zero norm)",
        arity("array_unit(a)", 1)(es => graft.functions.ArrayUnit(es.head))),
      ("md5_prefix32", "md5_prefix32(s) - first 4 md5 bytes as uint32 long",
        arity("md5_prefix32(s)", 1)(es => Md5Prefix32(es.head))),
      ("md5_lanes4", "md5_lanes4(s) - all four 32-bit md5 lanes as array<long>",
        arity("md5_lanes4(s)", 1)(es => Md5Lanes4(es.head))),
      ("bpe_encode", "bpe_encode(s, merges) - BPE tokens for a 'a b;c d' merge list",
        arity("bpe_encode(s, merges)", 2)(es =>
          graft.functions.BpeEncode(es.head,
            parseMerges("bpe_encode(s, merges)", es)))),
      // byte-level symbols never contain a raw space (0x20 maps to Ġ),
      // so the same 'a b;c d' merge-list encoding is unambiguous here
      ("byte_level_words", "byte_level_words(s) - GPT-2 byte-level pretokens (case-preserving, space-mapped)",
        arity("byte_level_words(s)", 1)(es =>
          graft.functions.ByteLevelWords(es.head))),
      ("byte_level_encode", "byte_level_encode(s, merges) - byte-level BPE tokens for a 'a b;c d' merge list",
        arity("byte_level_encode(s, merges)", 2)(es =>
          graft.functions.ByteLevelEncode(es.head,
            parseMerges("byte_level_encode(s, merges)", es)))),
      ("shingle_hashes", "shingle_hashes(text, n) - md5-prefix hash per n-char window",
        arity("shingle_hashes(text, n)", 2)(es =>
          ShingleHashes(es.head, intLit("shingle_hashes(text, n)", es, 1)))),
      ("word_ngram_hashes", "word_ngram_hashes(text, n) - md5-prefix hash per word n-gram",
        arity("word_ngram_hashes(text, n)", 2)(es =>
          WordNgramHashes(es.head, intLit("word_ngram_hashes(text, n)", es, 1)))),
      ("minhash_signature", "minhash_signature(text, n, k) - k-perm MinHash signature",
        arity("minhash_signature(text, n, k)", 3)(es =>
          MinhashSignature(es.head, intLit("minhash_signature(text, n, k)", es, 1),
            intLit("minhash_signature(text, n, k)", es, 2)))),
      ("minhash_doc_state", "minhash_doc_state(text, n, k) - struct<hs, sz, sig>",
        arity("minhash_doc_state(text, n, k)", 3)(es =>
          MinhashDocState(es.head, intLit("minhash_doc_state(text, n, k)", es, 1),
            intLit("minhash_doc_state(text, n, k)", es, 2)))),
      ("sorted_intersect_count", "sorted_intersect_count(a, b) - |a ∩ b| merge walk",
        arity("sorted_intersect_count(a, b)", 2)(es =>
          SortedIntersectCount(es.head, es(1)))),
      ("positional_eq_count", "positional_eq_count(a, b) - count of equal positions",
        arity("positional_eq_count(a, b)", 2)(es =>
          PositionalEqCount(es.head, es(1)))),
      ("normalized_name", "normalized_name(s) - struct<norm, tokens> company normalize",
        arity("normalized_name(s)", 1)(es => NormalizedName(es.head))),
      ("phrase_hits", "phrase_hits(s, phrases, maxLen) - sorted indices of 'p1;p2;...' phrases present as word n-grams",
        arity("phrase_hits(s, phrases, maxLen)", 3)(es => {
          val sig = "phrase_hits(s, phrases, maxLen)"
          val maxLen = intLit(sig, es, 2)
          if (maxLen < 1) fail(sig, s"maxLen must be >= 1, got $maxLen")
          // keep EMPTY segments: indices must stay aligned with the
          // user's p1;p2;... positions (PhraseHits skips empties while
          // preserving indices)
          graft.functions.PhraseHits(es.head,
            stringLit(sig, es, 1).split(";", -1).toSeq, maxLen)
        })))
    fns.map { case (name, usage, builder) =>
      (FunctionIdentifier(name), info(name, usage), builder)
    }
  }

  /** Register the same surface on an ALREADY-BUILT session (notebooks,
    * shells, tests — anywhere the session predates the library):
    * functions via the registry, the range-join rewrite via
    * `experimental.extraOptimizations` (the live-session twin of
    * `injectOptimizerRule`; same rule object, so conf flags behave
    * identically). */
  def registerAll(spark: org.apache.spark.sql.SparkSession): Unit = {
    injections.foreach { case (id, inf, builder) =>
      spark.sessionState.functionRegistry
        .registerFunction(id, inf, builder)
    }
    if (!spark.experimental.extraOptimizations
        .contains(graft.plans.AutoBinRangeJoin))
      spark.experimental.extraOptimizations ++=
        Seq(graft.plans.AutoBinRangeJoin)
  }
}
