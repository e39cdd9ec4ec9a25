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
/** [[org.apache.spark.sql.catalyst.expressions.ImplicitCastInputTypes]]
  * with the contract declared as public `DataType`s: Spark 4 made
  * `AbstractDataType` private[sql], so an expression living outside the
  * sql package can't override `inputTypes` directly — this trait (in
  * the sql namespace, same pattern as [[Bridge]]) adapts a public
  * `Seq[DataType]` into it. Gives analysis-time coercion/rejection
  * (DECIMAL score → DOUBLE cast, VARCHAR score → AnalysisException)
  * instead of a mid-task ClassCastException. */
trait DeclaredInputTypes
    extends org.apache.spark.sql.catalyst.expressions.ImplicitCastInputTypes {
  self: Expression =>
  /** The expression's input contract in public types. */
  def declaredInputTypes: Seq[org.apache.spark.sql.types.DataType]
  override final def inputTypes: Seq[org.apache.spark.sql.types.AbstractDataType] =
    declaredInputTypes
}

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
