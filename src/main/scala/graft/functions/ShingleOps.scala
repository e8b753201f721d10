package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.UnsafeArrayData
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/**
 * Hashed character shingles of a string as ONE native expression:
 * `shingle_hashes(text, n)` = array of Md5Prefix32 values of every n-char
 * window of `text` (multiset — duplicates kept; min-aggregation and
 * collect_set downstream are insensitive to duplicates, and the DuckDB
 * oracles dedup on their side).
 *
 * Value-identical to
 * `transform(charShingles(text, n), s => md5_prefix32(s))` modulo
 * duplicates: window i hashes the same bytes `substring(text, i, n)`
 * hashes. Texts shorter than n (including "") produce ONE hash of the
 * whole text — mirroring charShingles' `greatest(len-n+1, 1)` guard.
 *
 * Why an Expression: the composed form runs an INTERPRETED transform()
 * lambda (sequence + substr) allocating one UTF8String per window, then a
 * second pass hashing each. This walks the UTF-8 bytes once, tracking
 * code-point boundaries, and digests byte slices in place — zero
 * allocation per window beyond the 16-byte digest. The MinHash shingle
 * scan is the dominant cost of the dedup operators; measured at sf0.1
 * this form removed the interpreted-lambda wall entirely.
 *
 * Pass `lower(text)` as the child for case-folded shingles — keeping
 * case-folding in the composed plan guarantees bit-parity with the
 * composed form for any input.
 */
case class ShingleHashes(child: Expression, n: Int) extends UnaryExpression {

  require(n > 0, "shingle size must be positive")

  override def dataType: DataType = ArrayType(LongType, containsNull = false)

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == StringType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"shingle_hashes requires string, got ${child.dataType.catalogString}")

  override def nullSafeEval(s: Any): Any =
    ShingleHashes.compute(s.asInstanceOf[UTF8String], n)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, s => s"graft.functions.ShingleHashes.compute($s, $n)")

  override protected def withNewChildInternal(newChild: Expression): ShingleHashes =
    copy(child = newChild)

  override def prettyName: String = "shingle_hashes"
}

object ShingleHashes {
  private val digests = new ThreadLocal[java.security.MessageDigest] {
    override def initialValue(): java.security.MessageDigest =
      java.security.MessageDigest.getInstance("MD5")
  }

  private def md5Prefix32(bytes: Array[Byte], from: Int, len: Int): Long = {
    val md = digests.get()
    md.reset()
    md.update(bytes, from, len)
    val d = md.digest()
    ((d(0) & 0xFFL) << 24) | ((d(1) & 0xFFL) << 16) |
      ((d(2) & 0xFFL) << 8) | (d(3) & 0xFFL)
  }

  /** Byte offset of each code-point start, plus the end offset. */
  private def charOffsets(bytes: Array[Byte]): Array[Int] = {
    val offs = new Array[Int](bytes.length + 1)
    var i = 0
    var c = 0
    while (i < bytes.length) {
      offs(c) = i
      val b = bytes(i) & 0xFF
      i += (if (b < 0x80) 1 else if (b < 0xE0) 2 else if (b < 0xF0) 3 else 4)
      c += 1
    }
    offs(c) = bytes.length
    java.util.Arrays.copyOf(offs, c + 1)
  }

  /** Raw hash multiset as a primitive array (shared with the MinHash
    * expressions, which fold/sort it without materializing an ArrayData). */
  def computeRaw(s: UTF8String, n: Int): Array[Long] = {
    val bytes = s.getBytes
    val offs = charOffsets(bytes)
    val chars = offs.length - 1
    val windows = math.max(chars - n + 1, 1)
    val out = new Array[Long](windows)
    var i = 0
    while (i < windows) {
      val from = offs(i)
      val until = offs(math.min(i + n, chars))
      out(i) = md5Prefix32(bytes, from, until - from)
      i += 1
    }
    out
  }

  /** Kernel; static so generated code calls it directly. */
  def compute(s: UTF8String, n: Int): ArrayData =
    UnsafeArrayData.fromPrimitiveArray(computeRaw(s, n))

  def register(spark: org.apache.spark.sql.SparkSession): Unit =
    org.apache.spark.sql.graftshim.GraftShim.registerFunction(
      spark, "shingle_hashes", exprs => ShingleHashes(exprs.head,
        exprs(1).eval().asInstanceOf[Int]))
}

/**
 * Hashed word n-grams of a string as ONE native expression:
 * `word_ngram_hashes(text, n)` = array of Md5Prefix32 values of each
 * space-joined n-gram over the whitespace tokens of `text` (multiset;
 * dedup downstream). Fewer than n tokens → empty array.
 *
 * Value-identical to hashing `concat_ws(' ', tok_i..tok_{i+n-1})` for the
 * tokens of `split(text, '\\s+')` with empties dropped — the exact gram
 * strings the inverted-index Jaccard join builds via posexplode + lead()
 * windows. Replacing that shape removes a full per-doc window SHUFFLE
 * (partitionBy id, orderBy pos) from the n-gram pipeline: gram hashing
 * becomes scan-local. Pass `lower(text)` for case-folded grams.
 */
case class WordNgramHashes(child: Expression, n: Int) extends UnaryExpression {

  require(n > 0, "ngram size must be positive")

  override def dataType: DataType = ArrayType(LongType, containsNull = false)

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == StringType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"word_ngram_hashes requires string, got ${child.dataType.catalogString}")

  override def nullSafeEval(s: Any): Any =
    WordNgramHashes.compute(s.asInstanceOf[UTF8String], n)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, s => s"graft.functions.WordNgramHashes.compute($s, $n)")

  override protected def withNewChildInternal(newChild: Expression): WordNgramHashes =
    copy(child = newChild)

  override def prettyName: String = "word_ngram_hashes"
}

object WordNgramHashes {
  private val ws = java.util.regex.Pattern.compile("\\s+")

  /** Kernel; static so generated code calls it directly. Tokenization is
    * the same Java-regex `\s+` split Spark's `split()` performs, so gram
    * strings (and therefore hashes) are bit-identical to the composed
    * form. */
  def compute(s: UTF8String, n: Int): ArrayData = {
    val toks0 = ws.split(s.toString, -1)
    var nTok = 0
    var i = 0
    while (i < toks0.length) {
      if (!toks0(i).isEmpty) { toks0(nTok) = toks0(i); nTok += 1 }
      i += 1
    }
    if (nTok < n) return UnsafeArrayData.fromPrimitiveArray(new Array[Long](0))
    val out = new Array[Long](nTok - n + 1)
    val sb = new java.lang.StringBuilder
    i = 0
    while (i < out.length) {
      sb.setLength(0)
      var j = 0
      while (j < n) {
        if (j > 0) sb.append(' ')
        sb.append(toks0(i + j))
        j += 1
      }
      out(i) = Md5Prefix32.compute(UTF8String.fromString(sb.toString))
      i += 1
    }
    UnsafeArrayData.fromPrimitiveArray(out)
  }

  def register(spark: org.apache.spark.sql.SparkSession): Unit =
    org.apache.spark.sql.graftshim.GraftShim.registerFunction(
      spark, "word_ngram_hashes", exprs => WordNgramHashes(exprs.head,
        exprs(1).eval().asInstanceOf[Int]))
}
