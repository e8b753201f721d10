package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/**
 * BPE tokenization with a FIXED, already-learned merge list:
 * `BpeEncode(text, merges)` → `array<string>` of subword tokens.
 *
 * Apply semantics (the canonical definition this engine pins — the
 * trainer's reference spec and the q166 DuckDB oracle replay it
 * verbatim): lowercase, whitespace-split, drop empty words; per word,
 * start from single characters and repeatedly merge the LEFTMOST
 * occurrence of the LOWEST-RANK adjacent pair present, until no ranked
 * pair remains; the doc's token stream is the per-word results
 * concatenated in word order. One-occurrence-per-step is equivalent in
 * result to the merge-all-occurrences formulation (a merged symbol
 * `a+b` can never recreate `a` or `b`), and it is the form a recursive
 * SQL oracle can replay exactly.
 *
 * This is a scan-local projection (no shuffle): the merge table rides
 * into generated code as a reference object, and the per-word loop is
 * a primitive-index loop over a small array — the same
 * static-call-kernel discipline as [[MinhashSignature]]. Tokenizing
 * 100 TB is therefore exactly one pass over the text column.
 *
 * Beyond-reference operator (the training-data-pipeline mandate): the
 * reference has no tokenizer; the merge-loop semantics follow the
 * published BPE construction (Sennrich et al. 2016, "Neural Machine
 * Translation of Rare Words with Subword Units"), word-level variant.
 */
case class BpeEncode(child: Expression, merges: Seq[(String, String)])
    extends UnaryExpression {

  override def dataType: DataType = ArrayType(StringType, containsNull = false)

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == StringType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"bpe_encode requires string, got ${child.dataType.catalogString}")

  @transient private lazy val ranks: java.util.HashMap[String, Integer] = {
    val m = new java.util.HashMap[String, Integer]()
    merges.zipWithIndex.foreach { case ((a, b), r) =>
      // first rank wins on duplicate pairs (lowest = earliest merge)
      if (!m.containsKey(a + "\u0000" + b)) m.put(a + "\u0000" + b, r)
    }
    m
  }

  override def nullSafeEval(s: Any): Any =
    BpeEncode.compute(s.asInstanceOf[UTF8String], ranks)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("bpeRanks", ranks,
      "java.util.HashMap<String, Integer>")
    defineCodeGen(ctx, ev, s => s"graft.functions.BpeEncode.compute($s, $ref)")
  }

  override protected def withNewChildInternal(newChild: Expression): BpeEncode =
    copy(child = newChild)

  override def prettyName: String = "bpe_encode"
}

object BpeEncode {

  /** Tokenize one word (already lowercased, non-empty): leftmost
    * lowest-rank merge to fixpoint. */
  private[functions] def encodeWord(word: String,
                         ranks: java.util.HashMap[String, Integer]): Array[String] = {
    // iterate by code points, not UTF-16 units — the trainer's
    // split(word, "") alphabet is code points, and the two must agree
    // or supplementary characters could never match a trained merge
    var syms = new Array[String](word.codePointCount(0, word.length))
    var i = 0
    var off = 0
    while (off < word.length) {
      val next = word.offsetByCodePoints(off, 1)
      syms(i) = word.substring(off, next)
      i += 1; off = next
    }
    var n = syms.length
    var merged = true
    while (merged && n > 1) {
      var bestRank = Int.MaxValue
      var bestI = -1
      var j = 0
      while (j < n - 1) {
        val r = ranks.get(syms(j) + "\u0000" + syms(j + 1))
        if (r != null && r < bestRank) { bestRank = r; bestI = j }
        j += 1
      }
      if (bestI < 0) merged = false
      else {
        syms(bestI) = syms(bestI) + syms(bestI + 1)
        var k = bestI + 1
        while (k < n - 1) { syms(k) = syms(k + 1); k += 1 }
        n -= 1
      }
    }
    if (n == syms.length) syms else java.util.Arrays.copyOf(syms, n)
  }

  def compute(text: UTF8String,
              ranks: java.util.HashMap[String, Integer]): ArrayData = {
    val words = text.toString.toLowerCase.split("\\s+")
    val out = scala.collection.mutable.ArrayBuffer[UTF8String]()
    var w = 0
    while (w < words.length) {
      if (words(w).nonEmpty) {
        val toks = encodeWord(words(w), ranks)
        var t = 0
        while (t < toks.length) {
          out += UTF8String.fromString(toks(t)); t += 1
        }
      }
      w += 1
    }
    new GenericArrayData(out.toArray[Any])
  }
}
