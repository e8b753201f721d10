package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, UnaryExpression, UnsafeArrayData}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/**
 * Whole-document MinHash state as ONE native expression:
 * `minhash_doc_state(text, n, numHashes)` →
 * `struct<hs: array<long>, sz: int, sig: array<long>>` where
 *  - `hs`  = SORTED DISTINCT Md5Prefix32 hashes of every n-char shingle of
 *    `text` (the exact-Jaccard verify input for [[SortedIntersectCount]]),
 *  - `sz`  = |hs|,
 *  - `sig` = MinHash signature: for permutation i,
 *    `min over h of (h·(2i+1) + (i·2654435761) mod p) mod p`,
 *    p = 4294967311 — the same affine family `Dedup.permute` spells as
 *    Columns, bit-identical to the explode + min-aggregate formulation
 *    (and to the DuckDB oracles that replay it).
 *
 * Why ONE expression: shingle hashing is the dominant cost of MinHash
 * dedup, and hs + sig both derive from the same raw hash stream. Splitting
 * them across Column expressions either scans the text twice (two
 * projections) or leans on codegen subexpression elimination across
 * CollapseProject'd GetStructFields. This computes the stream once per row,
 * entirely scan-local — the groupBy(id) + collect_set + 16 min-aggregates
 * formulation this replaces paid a full shuffle of every per-doc hash set
 * just to reassemble rows that were never split.
 */
case class MinhashDocState(child: Expression, n: Int, numHashes: Int)
    extends UnaryExpression {

  require(n > 0 && numHashes > 0)

  override def dataType: DataType = MinhashDocState.schema

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == StringType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"minhash_doc_state requires string, got ${child.dataType.catalogString}")

  override def nullSafeEval(s: Any): Any =
    MinhashDocState.compute(s.asInstanceOf[UTF8String], n, numHashes)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev,
      s => s"graft.functions.MinhashDocState.compute($s, $n, $numHashes)")

  override protected def withNewChildInternal(newChild: Expression): MinhashDocState =
    copy(child = newChild)

  override def prettyName: String = "minhash_doc_state"
}

object MinhashDocState {
  val schema: StructType = StructType(Seq(
    StructField("hs", ArrayType(LongType, containsNull = false), nullable = false),
    StructField("sz", IntegerType, nullable = false),
    StructField("sig", ArrayType(LongType, containsNull = false), nullable = false)))

  val Prime = 4294967311L

  /** Kernel; static so generated code calls it directly. */
  def compute(s: UTF8String, n: Int, numHashes: Int): InternalRow = {
    val raw = ShingleHashes.computeRaw(s, n)
    // signature minima over the raw multiset (min is duplicate-insensitive)
    val sig = new Array[Long](numHashes)
    var k = 0
    while (k < numHashes) {
      val mul = 2L * k + 1
      val add = (k * 2654435761L) % Prime
      var best = Long.MaxValue
      var i = 0
      while (i < raw.length) {
        val v = (raw(i) * mul + add) % Prime  // operands < 2^41: exact, non-negative
        if (v < best) best = v
        i += 1
      }
      sig(k) = best
      k += 1
    }
    // sorted distinct set
    java.util.Arrays.sort(raw)
    var m = 0
    var i = 0
    while (i < raw.length) {
      if (m == 0 || raw(i) != raw(m - 1)) { raw(m) = raw(i); m += 1 }
      i += 1
    }
    val hs = java.util.Arrays.copyOf(raw, m)
    val row = new org.apache.spark.sql.catalyst.expressions.GenericInternalRow(3)
    row.update(0, UnsafeArrayData.fromPrimitiveArray(hs))
    row.setInt(1, m)
    row.update(2, UnsafeArrayData.fromPrimitiveArray(sig))
    row
  }

  def register(spark: org.apache.spark.sql.SparkSession): Unit =
    org.apache.spark.sql.graftshim.GraftShim.registerFunction(
      spark, "minhash_doc_state", exprs => MinhashDocState(exprs.head,
        exprs(1).eval().asInstanceOf[Int], exprs(2).eval().asInstanceOf[Int]))
}

/**
 * MinHash signature only: `minhash_signature(text, n, numHashes)` →
 * `array<long>`. Same affine family as [[MinhashDocState]]; for callers
 * that don't need the shingle sets (signature export, banding-only
 * pipelines) this skips the sort/dedup entirely and keeps the whole
 * operator a scan-local projection — no explode, no aggregation, no
 * shuffle.
 */
case class MinhashSignature(child: Expression, n: Int, numHashes: Int)
    extends UnaryExpression {

  require(n > 0 && numHashes > 0)

  override def dataType: DataType = ArrayType(LongType, containsNull = false)

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == StringType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"minhash_signature requires string, got ${child.dataType.catalogString}")

  override def nullSafeEval(s: Any): Any =
    MinhashSignature.compute(s.asInstanceOf[UTF8String], n, numHashes)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev,
      s => s"graft.functions.MinhashSignature.compute($s, $n, $numHashes)")

  override protected def withNewChildInternal(newChild: Expression): MinhashSignature =
    copy(child = newChild)

  override def prettyName: String = "minhash_signature"
}

object MinhashSignature {
  def compute(s: UTF8String, n: Int, numHashes: Int): ArrayData = {
    val raw = ShingleHashes.computeRaw(s, n)
    val sig = new Array[Long](numHashes)
    var k = 0
    while (k < numHashes) {
      val mul = 2L * k + 1
      val add = (k * 2654435761L) % MinhashDocState.Prime
      var best = Long.MaxValue
      var i = 0
      while (i < raw.length) {
        val v = (raw(i) * mul + add) % MinhashDocState.Prime
        if (v < best) best = v
        i += 1
      }
      sig(k) = best
      k += 1
    }
    UnsafeArrayData.fromPrimitiveArray(sig)
  }

  def register(spark: org.apache.spark.sql.SparkSession): Unit =
    org.apache.spark.sql.graftshim.GraftShim.registerFunction(
      spark, "minhash_signature", exprs => MinhashSignature(exprs.head,
        exprs(1).eval().asInstanceOf[Int], exprs(2).eval().asInstanceOf[Int]))
}

/**
 * Count of positions where two equal-length long arrays agree:
 * `positional_eq_count(a, b)`. The MinHash signature-agreement estimator —
 * `zip_with + aggregate` spells the same number through two interpreted
 * higher-order lambdas and an intermediate array per pair; this is a
 * primitive loop in codegen on the candidate-verify hot path.
 * Length mismatch → 0 matches beyond the shorter length (callers pass
 * same-numHashes signatures).
 */
case class PositionalEqCount(left: Expression, right: Expression)
    extends BinaryExpression {

  override def dataType: DataType = IntegerType

  override def checkInputDataTypes(): TypeCheckResult = {
    def ok(dt: DataType): Boolean = dt match {
      case ArrayType(LongType, _) => true
      case _ => false
    }
    if (ok(left.dataType) && ok(right.dataType)) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"positional_eq_count requires (array<bigint>, array<bigint>), got " +
        s"(${left.dataType.catalogString}, ${right.dataType.catalogString})")
  }

  override def nullSafeEval(a: Any, b: Any): Any =
    PositionalEqCount.compute(
      a.asInstanceOf[ArrayData], b.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (a, b) =>
      s"graft.functions.PositionalEqCount.compute($a, $b)")

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): PositionalEqCount =
    copy(left = newLeft, right = newRight)

  override def prettyName: String = "positional_eq_count"
}

object PositionalEqCount {
  def compute(a: ArrayData, b: ArrayData): Int = {
    val n = math.min(a.numElements(), b.numElements())
    var i = 0
    var c = 0
    while (i < n) {
      if (a.getLong(i) == b.getLong(i)) c += 1
      i += 1
    }
    c
  }

  def register(spark: org.apache.spark.sql.SparkSession): Unit =
    org.apache.spark.sql.graftshim.GraftShim.registerFunction(
      spark, "positional_eq_count",
      exprs => PositionalEqCount(exprs.head, exprs(1)))
}
