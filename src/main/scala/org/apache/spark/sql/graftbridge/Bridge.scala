package org.apache.spark.sql.graftbridge

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.classic.ExpressionUtils

/** Column ⇄ Expression bridge. Spark 4 made these converters
  * private[sql] (org.apache.spark.sql.classic.ExpressionUtils), so
  * libraries adding native Catalyst expressions expose them through a
  * one-liner in the sql package namespace — the standard extension
  * pattern. No Spark internals are re-implemented here.
  */
object Bridge {
  def column(e: Expression): Column = ExpressionUtils.column(e)
  def expression(c: Column): Expression = ExpressionUtils.expression(c)

  /** Register a function into an EXISTING session's registry (the
    * spark.sql.extensions config only applies to sessions created after
    * it is set; sessionState is private[sql] in Spark 4). */
  def registerFunction(
      spark: org.apache.spark.sql.SparkSession,
      id: org.apache.spark.sql.catalyst.FunctionIdentifier,
      info: org.apache.spark.sql.catalyst.expressions.ExpressionInfo,
      builder: Seq[Expression] => Expression): Unit =
    spark.asInstanceOf[org.apache.spark.sql.classic.SparkSession]
      .sessionState.functionRegistry
      .registerFunction(id, info, builder)
}
