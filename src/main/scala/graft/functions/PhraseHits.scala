package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, IntegerType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/**
 * Multi-phrase dictionary matching as ONE codegen projection:
 * `PhraseHits(text, phrases, maxLen)` → sorted distinct indices (into
 * the normalized `phrases` list) of every dictionary phrase present in
 * the text as a word 1..maxLen-gram — the Aho–Corasick-style scan of a
 * native engine, expressed as a scan-local kernel.
 *
 * Semantics BIT-MATCH the composed form
 * ([[graft.operators.Tagging.tagPhrases]]'s gram side): tokens are
 * `lower(text)` whitespace-split with empties dropped; a phrase hits
 * iff it equals some single-space-joined token n-gram (n ≤ maxLen);
 * presence, not occurrence count (indices are distinct'd).
 * `TaggingSpec` pins frame equality of the two forms on real documents.
 *
 * Versus the explode+broadcast-join form: NO Generate (the corpus never
 * materializes its gram stream — ~maxLen rows per token), no join probe
 * per gram; the dictionary rides into generated code as a reference
 * hash map and only MATCHED indices leave the projection. The join form
 * still wins for dictionaries too large to ship as a plan constant;
 * this kernel is the fixed-taxonomy fast path.
 */
case class PhraseHits(child: Expression, phrases: Seq[String], maxLen: Int)
    extends UnaryExpression {

  override def dataType: DataType = ArrayType(IntegerType, containsNull = false)

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == StringType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"phrase_hits requires string, got ${child.dataType.catalogString}")

  /** phrase (lowercased, whitespace-collapsed, trimmed) → index; first
    * index wins on duplicates — mirror of tagPhrases' dict distinct.
    * Lowercasing goes through UTF8String — the SAME primitive Spark's
    * `lower()` uses on the join-form side — so kernel and join form
    * agree beyond ASCII (İ, ſ and friends differ under Java's
    * locale-based toLowerCase). */
  @transient private lazy val index: java.util.HashMap[String, Integer] = {
    val m = new java.util.HashMap[String, Integer]()
    phrases.zipWithIndex.foreach { case (p, i) =>
      val norm = UTF8String.fromString(p).toLowerCase.toString.trim
        .replaceAll("\\s+", " ")
      if (norm.nonEmpty && !m.containsKey(norm)) m.put(norm, i)
    }
    m
  }

  override def nullSafeEval(s: Any): Any =
    PhraseHits.compute(s.asInstanceOf[UTF8String], index, maxLen)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("phraseIdx", index,
      "java.util.HashMap<String, Integer>")
    defineCodeGen(ctx, ev,
      s => s"graft.functions.PhraseHits.compute($s, $ref, $maxLen)")
  }

  override protected def withNewChildInternal(newChild: Expression): PhraseHits =
    copy(child = newChild)

  override def prettyName: String = "phrase_hits"
}

object PhraseHits {

  def compute(text: UTF8String,
              index: java.util.HashMap[String, Integer],
              maxLen: Int): ArrayData = {
    // UTF8String.toLowerCase == Spark's lower(): bit-parity with the
    // composed tagPhrases form on non-ASCII case mappings
    val words0 = text.toLowerCase.toString.split("\\s+")
    // drop empties (leading-whitespace split artifact)
    var n = 0
    var i = 0
    while (i < words0.length) { if (words0(i).nonEmpty) n += 1; i += 1 }
    val words = if (n == words0.length) words0 else {
      val w = new Array[String](n); var j = 0; i = 0
      while (i < words0.length) {
        if (words0(i).nonEmpty) { w(j) = words0(i); j += 1 }
        i += 1
      }
      w
    }
    val hits = new java.util.TreeSet[Integer]()
    var p = 0
    while (maxLen >= 1 && p < words.length) {
      val sb = new java.lang.StringBuilder(words(p))
      var len = 1
      var done = false
      while (!done) {
        val idx = index.get(sb.toString)
        if (idx != null) hits.add(idx)
        len += 1
        if (len > maxLen || p + len > words.length) done = true
        else { sb.append(' '); sb.append(words(p + len - 1)) }
      }
      p += 1
    }
    val out = new Array[Any](hits.size)
    val it = hits.iterator()
    var k = 0
    while (it.hasNext) { out(k) = it.next().intValue(); k += 1 }
    new GenericArrayData(out)
  }
}
