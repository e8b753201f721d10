package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression, UnsafeArrayData}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType, FloatType}

/**
 * v/‖v‖ as a native Catalyst expression — the [[ArrayDot]] discipline
 * applied to normalization.
 *
 * Why not `transform(a, x => x / norm(a))`: ArrayTransform evaluates its
 * function expression INTERPRETED once per ELEMENT, and the captured
 * `norm(a)` subtree (a full dot pass + sqrt) is part of that function —
 * so the composed form does O(D²) multiply-adds per row on D-dim
 * vectors. This kernel is one primitive pass (accumulate, sqrt, divide)
 * inside whole-stage codegen. Same accumulation order and double
 * arithmetic as `sqrt(array_dot(a,a))` followed by the per-element
 * divide, so results are bit-identical to the HOF form the oracles were
 * validated against.
 *
 * NULL for: null input, zero norm, or an array containing a null
 * element (the HOF form produced an array of nulls for that last case —
 * a shape no caller wants; every consumer filters `unit(...).isNull`).
 */
case class ArrayUnit(child: Expression) extends UnaryExpression {

  override def dataType: DataType = ArrayType(DoubleType, containsNull = false)
  override def nullable: Boolean = true

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(FloatType | DoubleType, _) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"array_unit requires array<float|double>, got ${other.catalogString}")
  }

  private lazy val isFloat =
    child.dataType.asInstanceOf[ArrayType].elementType == FloatType

  override def nullSafeEval(a: Any): Any =
    ArrayUnit.compute(a.asInstanceOf[ArrayData], isFloat)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, a => {
      s"""
         |org.apache.spark.sql.catalyst.util.ArrayData ${ev.value}_r =
         |  graft.functions.ArrayUnit.compute($a, $isFloat);
         |if (${ev.value}_r == null) {
         |  ${ev.isNull} = true;
         |} else {
         |  ${ev.value} = ${ev.value}_r;
         |}
       """.stripMargin
    })

  override protected def withNewChildInternal(newChild: Expression): ArrayUnit =
    copy(child = newChild)

  override def prettyName: String = "array_unit"
}

object ArrayUnit {
  /** Scalar kernel; static so generated code calls it directly. */
  def compute(a: ArrayData, aFloat: Boolean): ArrayData = {
    val n = a.numElements()
    val vals = new Array[Double](n)
    var s = 0.0
    var i = 0
    while (i < n) {
      if (a.isNullAt(i)) return null
      val x = if (aFloat) a.getFloat(i).toDouble else a.getDouble(i)
      vals(i) = x
      s += x * x
      i += 1
    }
    val nrm = math.sqrt(s)
    if (nrm == 0.0) return null
    i = 0
    while (i < n) { vals(i) /= nrm; i += 1 }
    UnsafeArrayData.fromPrimitiveArray(vals)
  }

  /** Register as a SQL function `array_unit(a)`. */
  def register(spark: org.apache.spark.sql.SparkSession): Unit =
    org.apache.spark.sql.graftshim.GraftShim.registerFunction(
      spark, "array_unit", exprs => ArrayUnit(exprs.head))
}
