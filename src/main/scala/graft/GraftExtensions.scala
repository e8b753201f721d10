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
  override def apply(ext: SparkSessionExtensions): Unit =
    GraftExtensions.injections.foreach(ext.injectFunction)
}

object GraftExtensions {

  private def info(name: String, usage: String): ExpressionInfo =
    new ExpressionInfo(classOf[GraftExtensions].getName, null, name, usage,
      "", "", "", "", "", "", "scala_udf")

  private def intLit(e: Expression): Int =
    e.eval().asInstanceOf[Number].intValue()

  /** The full kernel surface as injectable (identifier, info, builder)
    * triples — shared by the extensions path and [[registerAll]]. */
  lazy val injections: Seq[(FunctionIdentifier, ExpressionInfo,
      Seq[Expression] => Expression)] = {
    val fns: Seq[(String, String, Seq[Expression] => Expression)] = Seq(
      ("jaro_winkler", "jaro_winkler(a, b) - reference Jaro-Winkler similarity",
        es => JaroWinkler(es.head, es(1))),
      ("array_dot", "array_dot(a, b) - double-precision dot product",
        es => ArrayDot(es.head, es(1))),
      ("md5_prefix32", "md5_prefix32(s) - first 4 md5 bytes as uint32 long",
        es => Md5Prefix32(es.head)),
      ("shingle_hashes", "shingle_hashes(text, n) - md5-prefix hash per n-char window",
        es => ShingleHashes(es.head, intLit(es(1)))),
      ("word_ngram_hashes", "word_ngram_hashes(text, n) - md5-prefix hash per word n-gram",
        es => WordNgramHashes(es.head, intLit(es(1)))),
      ("minhash_signature", "minhash_signature(text, n, k) - k-perm MinHash signature",
        es => MinhashSignature(es.head, intLit(es(1)), intLit(es(2)))),
      ("minhash_doc_state", "minhash_doc_state(text, n, k) - struct<hs, sz, sig>",
        es => MinhashDocState(es.head, intLit(es(1)), intLit(es(2)))),
      ("sorted_intersect_count", "sorted_intersect_count(a, b) - |a ∩ b| merge walk",
        es => SortedIntersectCount(es.head, es(1))),
      ("positional_eq_count", "positional_eq_count(a, b) - count of equal positions",
        es => PositionalEqCount(es.head, es(1))),
      ("normalized_name", "normalized_name(s) - struct<norm, tokens> company normalize",
        es => NormalizedName(es.head)))
    fns.map { case (name, usage, builder) =>
      (FunctionIdentifier(name), info(name, usage), builder)
    }
  }

  /** Register the same surface on an ALREADY-BUILT session (notebooks,
    * shells, tests — anywhere the session predates the library). */
  def registerAll(spark: org.apache.spark.sql.SparkSession): Unit =
    injections.foreach { case (id, inf, builder) =>
      spark.sessionState.functionRegistry
        .registerFunction(id, inf, builder)
    }
}
