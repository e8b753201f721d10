package graft.functions

import java.security.MessageDigest

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, IntegerType, LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/**
 * md5-prefix hash of a string as a native Catalyst expression: the first
 * 4 digest bytes, big-endian, as an unsigned-32-bit long — bit-identical to
 * `conv(substring(md5(s), 1, 8), 16, 10)` (and to DuckDB's
 * `CAST(('0x' || substring(md5(s),1,8)) AS UBIGINT)`), which is the
 * engine-portable hash every dedup/fingerprint oracle in this engine
 * replays.
 *
 * Why an Expression: the composed form renders the digest to a 32-char hex
 * string, substrings it, then PARSES it back through conv's radix loop —
 * three string allocations per value. This goes digest → long directly and
 * the digest instance is thread-local (no per-row MessageDigest.getInstance).
 * On the MinHash shingle scan (millions of 5-char shingles) the composed
 * form was the dominant cost of the whole operator.
 */
case class Md5Prefix32(child: Expression) extends UnaryExpression {

  override def dataType: DataType = LongType

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == StringType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"md5_prefix32 requires string, got ${child.dataType.catalogString}")

  override def nullSafeEval(s: Any): Any =
    Md5Prefix32.compute(s.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, s => s"graft.functions.Md5Prefix32.compute($s)")

  override protected def withNewChildInternal(newChild: Expression): Md5Prefix32 =
    copy(child = newChild)

  override def prettyName: String = "md5_prefix32"
}

object Md5Prefix32 {
  private val digests = new ThreadLocal[MessageDigest] {
    override def initialValue(): MessageDigest =
      MessageDigest.getInstance("MD5")
  }

  /** Scalar kernel; static so generated code calls it directly. */
  def compute(s: UTF8String): Long = {
    val md = digests.get()
    md.reset()
    val d = md.digest(s.getBytes)
    ((d(0) & 0xFFL) << 24) | ((d(1) & 0xFFL) << 16) |
      ((d(2) & 0xFFL) << 8) | (d(3) & 0xFFL)
  }

  def register(spark: org.apache.spark.sql.SparkSession): Unit =
    org.apache.spark.sql.graftshim.GraftShim.registerFunction(
      spark, "md5_prefix32", exprs => Md5Prefix32(exprs.head))
}

/**
 * All four 32-bit lanes of one md5 digest as `array<long>` — lane j is
 * bit-identical to `conv(substring(md5(s), 1 + 8*j, 8), 16, 10)` (and to
 * DuckDB's `CAST(('0x' || substring(md5(s), 1 + j*8, 8)) AS UBIGINT)`).
 * One digest feeds four independent uniform draws (the Poisson-bootstrap
 * hot path): the composed hex-substring-conv form pays three string
 * allocations PER LANE on 4× the rows; this is one digest pass and four
 * shifts, no hex string ever materialized.
 */
case class Md5Lanes4(child: Expression) extends UnaryExpression {

  override def dataType: DataType = ArrayType(LongType, containsNull = false)

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == StringType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"md5_lanes4 requires string, got ${child.dataType.catalogString}")

  override def nullSafeEval(s: Any): Any =
    Md5Lanes4.compute(s.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, s => s"graft.functions.Md5Lanes4.compute($s)")

  override protected def withNewChildInternal(newChild: Expression): Md5Lanes4 =
    copy(child = newChild)

  override def prettyName: String = "md5_lanes4"
}

object Md5Lanes4 {
  private val digests = new ThreadLocal[MessageDigest] {
    override def initialValue(): MessageDigest =
      MessageDigest.getInstance("MD5")
  }

  /** Scalar kernel; static so generated code calls it directly. */
  def compute(s: UTF8String): ArrayData = {
    val md = digests.get()
    md.reset()
    val d = md.digest(s.getBytes)
    val out = new Array[Long](4)
    var j = 0
    while (j < 4) {
      val b = j * 4
      out(j) = ((d(b) & 0xFFL) << 24) | ((d(b + 1) & 0xFFL) << 16) |
        ((d(b + 2) & 0xFFL) << 8) | (d(b + 3) & 0xFFL)
      j += 1
    }
    new org.apache.spark.sql.catalyst.util.GenericArrayData(out)
  }
}

/**
 * |a ∩ b| for two SORTED arrays of distinct longs, as a single merge walk.
 *
 * Precondition (caller-enforced, not checked): both inputs sorted ascending
 * with distinct elements — the shape `sort_array(collect_set(...))`
 * produces. Under that precondition the count equals
 * `size(array_intersect(a, b))` exactly.
 *
 * Why an Expression: `array_intersect` builds a hash set per evaluation
 * (boxed for complex cases, and allocates the result array this caller
 * immediately reduces to a size). On the LSH verify step — O(candidate
 * pairs) evaluations over shingle sets with hundreds of elements — the
 * merge walk over primitive longs is ~10× cheaper and allocates nothing.
 */
case class SortedIntersectCount(left: Expression, right: Expression)
    extends BinaryExpression {

  override def dataType: DataType = IntegerType

  override def checkInputDataTypes(): TypeCheckResult = {
    def ok(dt: DataType): Boolean = dt match {
      case ArrayType(LongType, _) => true
      case _ => false
    }
    if (ok(left.dataType) && ok(right.dataType)) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"sorted_intersect_count requires (array<bigint>, array<bigint>), got " +
        s"(${left.dataType.catalogString}, ${right.dataType.catalogString})")
  }

  override def nullSafeEval(a: Any, b: Any): Any =
    SortedIntersectCount.compute(
      a.asInstanceOf[ArrayData], b.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (a, b) =>
      s"graft.functions.SortedIntersectCount.compute($a, $b)")

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): SortedIntersectCount =
    copy(left = newLeft, right = newRight)

  override def prettyName: String = "sorted_intersect_count"
}

object SortedIntersectCount {
  /** Merge walk; static so generated code calls it directly. Null elements
    * cannot occur in `sort_array(collect_set(...))` output; if present they
    * sort first and simply never match. */
  def compute(a: ArrayData, b: ArrayData): Int = {
    val na = a.numElements()
    val nb = b.numElements()
    var i = 0
    var j = 0
    var n = 0
    while (i < na && j < nb) {
      val x = a.getLong(i)
      val y = b.getLong(j)
      if (x == y) { n += 1; i += 1; j += 1 }
      else if (x < y) i += 1
      else j += 1
    }
    n
  }

  def register(spark: org.apache.spark.sql.SparkSession): Unit =
    org.apache.spark.sql.graftshim.GraftShim.registerFunction(
      spark, "sorted_intersect_count",
      exprs => SortedIntersectCount(exprs.head, exprs(1)))
}
