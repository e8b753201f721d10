package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, LongType}

/**
 * Hamming distance between two packed sign-bit code arrays
 * (Σ popcount(a[w] xor b[w])) as a native codegen expression — the
 * stage-0 scan kernel of the binary ANN serving path
 * ([[graft.operators.SimilaritySearch.hammingDistance]], q209/q211/
 * q214). At 100 TB this is the expression evaluated once per corpus
 * vector per query; the HOF form
 * `aggregate(zip_with(a,b,(x,y)=>bit_count(x^y)), 0L, +)` pays two
 * interpreted lambda frames and a zipped-array allocation per vector.
 *
 * Exact integer arithmetic — bit-equivalence is trivial
 * (ArrayHammingSumSpec pins it): same xor, same popcount, same sum.
 * Null semantics match the HOF: null array → NULL, length mismatch →
 * NULL (zip_with pads with null), any null element → NULL.
 */
case class ArrayHammingSum(left: Expression, right: Expression)
    extends BinaryExpression {

  override def dataType: DataType = LongType
  override def nullable: Boolean = true

  override def checkInputDataTypes(): TypeCheckResult = {
    def ok(dt: DataType): Boolean = dt match {
      case ArrayType(LongType, _) => true
      case _ => false
    }
    if (ok(left.dataType) && ok(right.dataType)) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"array_hamming_sum requires (array<bigint>, array<bigint>), got " +
        s"(${left.dataType.catalogString}, ${right.dataType.catalogString})")
  }

  override def nullSafeEval(a: Any, b: Any): Any =
    ArrayHammingSum.compute(a.asInstanceOf[ArrayData], b.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      s"""
         |java.lang.Long ${ev.value}_r = graft.functions.ArrayHammingSum.compute($a, $b);
         |if (${ev.value}_r == null) {
         |  ${ev.isNull} = true;
         |} else {
         |  ${ev.value} = ${ev.value}_r.longValue();
         |}
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): ArrayHammingSum =
    copy(left = newLeft, right = newRight)

  override def prettyName: String = "array_hamming_sum"
}

object ArrayHammingSum {
  /** Kernel; static so generated code calls it directly. */
  def compute(a: ArrayData, b: ArrayData): java.lang.Long = {
    val n = a.numElements()
    if (n != b.numElements()) return null
    var s = 0L
    var i = 0
    while (i < n) {
      if (a.isNullAt(i) || b.isNullAt(i)) return null
      s += java.lang.Long.bitCount(a.getLong(i) ^ b.getLong(i)).toLong
      i += 1
    }
    java.lang.Long.valueOf(s)
  }
}
