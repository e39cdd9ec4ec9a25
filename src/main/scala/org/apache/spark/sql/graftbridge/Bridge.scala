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
}
