package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType, FloatType}

/**
 * Flattened outer product a·bᵀ (row-major: out[i·|b|+j] = a[i]*b[j]) as
 * a native codegen expression — the OPQ Procrustes scatter kernel
 * (`SimilaritySearch.opqTrainWithFlat`).
 *
 * Replaces `flatten(transform(a, h => transform(b, x => h*x)))`: the
 * nested HOF interprets |a|·|b| lambda frames per row and allocates |a|
 * intermediate arrays plus the flatten copy — at d=64 that is 4096
 * interpreted multiplies and 65 array allocations per training row per
 * alternation. The kernel is one primitive loop into one output array.
 *
 * Bit-equivalence contract (ArrayOuterFlatSpec): each element is the
 * SAME single IEEE multiply a[i]*b[j] (widened to double first), so
 * order of emission is the only thing to preserve — row-major exactly
 * like the HOF. Null semantics: null a or null b → NULL (flatten
 * propagates a null inner array the same way); a null element in a or
 * b → null product elements at exactly the HOF's positions.
 */
case class ArrayOuterFlat(left: Expression, right: Expression)
    extends BinaryExpression {

  override def dataType: DataType = ArrayType(DoubleType, containsNull = true)
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
      s"array_outer_flat requires (array<float|double>, array<float|double>), " +
        s"got (${left.dataType.catalogString}, ${right.dataType.catalogString})")
  }

  private lazy val leftFloat = elemType(left) == FloatType
  private lazy val rightFloat = elemType(right) == FloatType

  override def nullSafeEval(a: Any, b: Any): Any =
    ArrayOuterFlat.compute(a.asInstanceOf[ArrayData],
      b.asInstanceOf[ArrayData], leftFloat, rightFloat)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      s"${ev.value} = graft.functions.ArrayOuterFlat.compute(" +
        s"$a, $b, $leftFloat, $rightFloat);"
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): ArrayOuterFlat =
    copy(left = newLeft, right = newRight)

  override def prettyName: String = "array_outer_flat"
}

object ArrayOuterFlat {
  /** Kernel; static so generated code calls it directly. Null elements
    * poison only their own products, as in the HOF form. */
  def compute(a: ArrayData, b: ArrayData,
              aFloat: Boolean, bFloat: Boolean): ArrayData = {
    val na = a.numElements()
    val nb = b.numElements()
    var hasNull = false
    var i = 0
    while (!hasNull && i < na) { if (a.isNullAt(i)) hasNull = true; i += 1 }
    i = 0
    while (!hasNull && i < nb) { if (b.isNullAt(i)) hasNull = true; i += 1 }
    if (hasNull) {
      // slow path: per-element null propagation at the HOF's positions
      val out = new Array[Any](na * nb)
      var x = 0
      while (x < na) {
        val aNull = a.isNullAt(x)
        val av = if (aNull) 0.0
          else if (aFloat) a.getFloat(x).toDouble else a.getDouble(x)
        var y = 0
        while (y < nb) {
          if (!aNull && !b.isNullAt(y)) {
            val bv = if (bFloat) b.getFloat(y).toDouble else b.getDouble(y)
            out(x * nb + y) = av * bv
          }
          y += 1
        }
        x += 1
      }
      new GenericArrayData(out)
    } else {
      val bv = new Array[Double](nb)
      var y = 0
      while (y < nb) {
        bv(y) = if (bFloat) b.getFloat(y).toDouble else b.getDouble(y)
        y += 1
      }
      val out = new Array[Double](na * nb)
      var x = 0
      while (x < na) {
        val av = if (aFloat) a.getFloat(x).toDouble else a.getDouble(x)
        val base = x * nb
        var k = 0
        while (k < nb) { out(base + k) = av * bv(k); k += 1 }
        x += 1
      }
      new GenericArrayData(out)
    }
  }
}
