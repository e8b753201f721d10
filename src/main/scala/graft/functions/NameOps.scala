package graft.functions

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/**
 * Company-name normalization as ONE native expression:
 * `normalized_name(name)` → `struct<norm: string, tokens: array<string>>`
 * where `norm` = TextFunctions.nameNormalize(name) and `tokens` =
 * TextFunctions.nameTokens(name) (reference: entity_resolution.py:76-106)
 * — bit-identical to the composed forms (HashOpsSpec asserts it), via the
 * SAME primitives Spark's built-ins use (UTF8String.trim/toLowerCase,
 * java.util.regex for `[^\w\s&]` / `\s+`, code-point lengths).
 *
 * Why ONE expression: the composed form chains two interpreted
 * higher-order lambdas (abbrev map lookup + suffix filter) over an
 * intermediate token array, and nameNormalize/nameTokens/blockingKey in
 * one projection each re-run the full chain. ER `prepSide` runs this per
 * account row on the build side of every blocked pair join — this kernel
 * tokenizes once and emits both outputs.
 */
case class NormalizedName(child: Expression) extends UnaryExpression {

  override def dataType: DataType = NormalizedName.schema

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == StringType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"normalized_name requires string, got ${child.dataType.catalogString}")

  override def nullSafeEval(s: Any): Any =
    NormalizedName.compute(s.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, s => s"graft.functions.NormalizedName.compute($s)")

  override protected def withNewChildInternal(newChild: Expression): NormalizedName =
    copy(child = newChild)

  override def prettyName: String = "normalized_name"
}

object NormalizedName {
  val schema: StructType = StructType(Seq(
    StructField("norm", StringType, nullable = false),
    StructField("tokens", ArrayType(StringType, containsNull = false),
      nullable = false)))

  private val NonWord = java.util.regex.Pattern.compile("[^\\w\\s&]")
  private val Ws = java.util.regex.Pattern.compile("\\s+")

  private val abbrevs: java.util.Map[String, String] = {
    val m = new java.util.HashMap[String, String]
    TextFunctions.Abbrevs.foreach { case (k, v) => m.put(k, v) }
    m
  }
  private val suffixes: java.util.Set[String] = {
    val s = new java.util.HashSet[String]
    TextFunctions.Suffixes.foreach(s.add)
    s
  }

  /** Kernel; static so generated code calls it directly. */
  def compute(u: UTF8String): InternalRow = {
    // trim (0x20 only) then lowercase — the same UTF8String ops Spark's
    // trim()/lower() built-ins delegate to
    val str = u.trim().toLowerCase().toString
    val spaced = NonWord.matcher(str).replaceAll(" ")
    val raw = Ws.split(spaced, -1)
    val kept = new java.util.ArrayList[String](raw.length)
    var i = 0
    while (i < raw.length) {
      val t0 = raw(i)
      if (!t0.isEmpty) {
        val t = abbrevs.getOrDefault(t0, t0)
        if (!suffixes.contains(t)) kept.add(t)
      }
      i += 1
    }
    val sb = new java.lang.StringBuilder
    val seen = new java.util.LinkedHashSet[String]
    i = 0
    while (i < kept.size) {
      val t = kept.get(i)
      if (i > 0) sb.append(' ')
      sb.append(t)
      // significant tokens: > 2 CODE POINTS (Column length() semantics)
      if (t.codePointCount(0, t.length) > 2) seen.add(t)
      i += 1
    }
    val toks = new Array[Any](seen.size)
    val it = seen.iterator()
    var j = 0
    while (it.hasNext) { toks(j) = UTF8String.fromString(it.next()); j += 1 }
    val row = new org.apache.spark.sql.catalyst.expressions.GenericInternalRow(2)
    row.update(0, UTF8String.fromString(sb.toString))
    row.update(1, new GenericArrayData(toks))
    row
  }

  def register(spark: org.apache.spark.sql.SparkSession): Unit =
    org.apache.spark.sql.graftshim.GraftShim.registerFunction(
      spark, "normalized_name", exprs => NormalizedName(exprs.head))
}
