package org.apache.spark.sql.graftshim

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.classic.ExpressionUtils

/**
 * Column ↔ Catalyst Expression bridge for Spark 4.x.
 *
 * Spark 4 routes Column through ColumnNode (connect-compatible API) and the
 * converters live behind `private[sql]`; a library defining custom Catalyst
 * expressions needs this one-file shim inside the org.apache.spark.sql
 * namespace — the same pattern Spark-native extension libraries use.
 */
object GraftShim {
  def expr(c: Column): Expression = ExpressionUtils.expression(c)
  def column(e: Expression): Column = ExpressionUtils.column(e)

  /** Register a scalar expression builder as a SQL function. */
  def registerFunction(spark: org.apache.spark.sql.SparkSession, name: String,
                       builder: Seq[Expression] => Expression): Unit =
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      name, builder, "scala_udf")
}
