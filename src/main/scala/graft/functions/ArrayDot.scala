package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType, FloatType}

/**
 * Dot product of two numeric arrays as a native Catalyst expression.
 *
 * Why an Expression and not `aggregate(zip_with(...))`: higher-order
 * functions are evaluated INTERPRETED per row (lambda variables, boxed
 * accumulators) and allocate an intermediate zipped array. On a pairwise
 * similarity join — O(pairs) evaluations, the hot loop of
 * `Dedup.cosineNearDups` / `SimilaritySearch.knnWithinBlock`
 * (reference analogue: the similarity baseline in scripts/evaluate.py and
 * account-embedding scoring in src/ml/pipeline.py) — this is the
 * difference between an interpreted allocation per pair and a tight
 * primitive loop inside whole-stage codegen.
 *
 * Semantics match the HOF formulation exactly (the DuckDB oracles were
 * validated against it): elements accumulate in double precision in index
 * order; a null element on either side, or a length mismatch (zip_with
 * would pad with null), yields NULL.
 */
case class ArrayDot(left: Expression, right: Expression)
    extends BinaryExpression {

  override def dataType: DataType = DoubleType
  override def nullable: Boolean = true

  private def elemType(e: Expression): DataType =
    e.dataType.asInstanceOf[ArrayType].elementType

  override def checkInputDataTypes(): TypeCheckResult = {
    def ok(dt: DataType): Boolean = dt match {
      case ArrayType(FloatType | DoubleType, _) => true
      case _ => false
    }
    if (ok(left.dataType) && ok(right.dataType)) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"array_dot requires (array<float|double>, array<float|double>), got " +
        s"(${left.dataType.catalogString}, ${right.dataType.catalogString})")
  }

  private lazy val leftFloat = elemType(left) == FloatType
  private lazy val rightFloat = elemType(right) == FloatType

  override def nullSafeEval(a: Any, b: Any): Any =
    ArrayDot.compute(a.asInstanceOf[ArrayData], b.asInstanceOf[ArrayData],
      leftFloat, rightFloat)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      s"""
         |java.lang.Double ${ev.value}_r = graft.functions.ArrayDot.compute(
         |  $a, $b, $leftFloat, $rightFloat);
         |if (${ev.value}_r == null) {
         |  ${ev.isNull} = true;
         |} else {
         |  ${ev.value} = ${ev.value}_r.doubleValue();
         |}
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): ArrayDot =
    copy(left = newLeft, right = newRight)

  override def prettyName: String = "array_dot"
}

object ArrayDot {
  /** Scalar kernel; static so generated code calls it directly. Returns
    * null (boxed) on length mismatch or null element — same as the
    * zip_with/aggregate formulation it replaces. */
  def compute(a: ArrayData, b: ArrayData,
              aFloat: Boolean, bFloat: Boolean): java.lang.Double = {
    val n = a.numElements()
    if (n != b.numElements()) return null
    var s = 0.0
    var i = 0
    while (i < n) {
      if (a.isNullAt(i) || b.isNullAt(i)) return null
      val x = if (aFloat) a.getFloat(i).toDouble else a.getDouble(i)
      val y = if (bFloat) b.getFloat(i).toDouble else b.getDouble(i)
      s += x * y
      i += 1
    }
    java.lang.Double.valueOf(s)
  }

  /** Register as a SQL function `array_dot(a, b)`. */
  def register(spark: org.apache.spark.sql.SparkSession): Unit =
    org.apache.spark.sql.graftshim.GraftShim.registerFunction(
      spark, "array_dot", exprs => ArrayDot(exprs.head, exprs(1)))
}
