package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType, FloatType}

/**
 * R·v for a FIXED d×d matrix R (an index-build artifact: the OPQ
 * rotation / the seeded fixture mixer) as a native codegen expression —
 * the kernel of [[graft.operators.SimilaritySearch.rotated]].
 *
 * Replaces the nested higher-order-function form
 * `transform(sequence(0,d−1), i => aggregate(zip_with(element_at(rLit,
 * i+1), v, (a,b) => a*b), 0.0, +))`, which interprets ~3·d² lambda
 * frames per row (d element_at probes into a 4096-literal array, d
 * zipped-array allocations, d interpreted folds — measured as a
 * dominant slice of q210's broadcast-build task time at d=64). The
 * kernel is one primitive double loop over a flattened `double[]`
 * carried as a codegen reference object.
 *
 * Bit-equivalence contract with the HOF form (ArrayMatVecSpec):
 * out[i] = fold over j, LEFT-TO-RIGHT from 0.0, of r[i][j] * v[j] with
 * v[j] widened to double first — identical IEEE sequence. Null
 * semantics: null input array → NULL (callers that need the HOF's
 * array-of-nulls wrap in coalesce, see `rotated`); any null element or
 * a length ≠ d → an array of d null elements, exactly what the
 * zip_with null-padding + null-absorbing fold produced.
 */
case class ArrayMatVec(child: Expression, r: Seq[Seq[Double]])
    extends UnaryExpression {

  private val d = r.length
  require(d >= 1 && r.forall(_.length == d),
    s"ArrayMatVec needs a square non-empty matrix (got ${r.map(_.length)})")

  override def dataType: DataType = ArrayType(DoubleType, containsNull = true)
  override def nullable: Boolean = child.nullable

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(FloatType | DoubleType, _) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"array_mat_vec requires array<float|double>, got ${other.catalogString}")
  }

  private lazy val childFloat =
    child.dataType.asInstanceOf[ArrayType].elementType == FloatType

  @transient private lazy val rFlat: Array[Double] = {
    val a = new Array[Double](d * d)
    var i = 0
    while (i < d) {
      var j = 0
      val row = r(i)
      while (j < d) { a(i * d + j) = row(j); j += 1 }
      i += 1
    }
    a
  }

  override def nullSafeEval(v: Any): Any =
    ArrayMatVec.compute(v.asInstanceOf[ArrayData], rFlat, d, childFloat)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val rRef = ctx.addReferenceObj("rFlat", rFlat, "double[]")
    nullSafeCodeGen(ctx, ev, v => {
      s"${ev.value} = graft.functions.ArrayMatVec.compute($v, $rRef, $d, $childFloat);"
    })
  }

  override protected def withNewChildInternal(newChild: Expression): ArrayMatVec =
    copy(child = newChild)

  override def prettyName: String = "array_mat_vec"
}

object ArrayMatVec {
  /** Kernel; static so generated code calls it directly. `rFlat` is the
    * row-major d×d matrix. Mirrors the HOF form: length mismatch or any
    * null element poisons EVERY output element (each output dim folds
    * over the full zipped vector), computed elements fold left-to-right
    * from 0.0. */
  def compute(v: ArrayData, rFlat: Array[Double], d: Int,
              vFloat: Boolean): ArrayData = {
    val n = v.numElements()
    var clean = n == d
    if (clean) {
      var i = 0
      while (clean && i < n) { if (v.isNullAt(i)) clean = false; i += 1 }
    }
    if (!clean) return new GenericArrayData(new Array[Any](d))
    val vv = new Array[Double](d)
    var j = 0
    while (j < d) {
      vv(j) = if (vFloat) v.getFloat(j).toDouble else v.getDouble(j)
      j += 1
    }
    val out = new Array[Double](d)
    var i = 0
    while (i < d) {
      var s = 0.0
      val base = i * d
      var k = 0
      while (k < d) { s += rFlat(base + k) * vv(k); k += 1 }
      out(i) = s
      i += 1
    }
    new GenericArrayData(out)
  }
}
