package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.functions._
import org.apache.spark.sql.graftbridge.Bridge
import org.apache.spark.sql.types.{DataType, DoubleType}

/** Native Catalyst expression for the vector hot path.
  *
  * Spark's higher-order functions (`zip_with`, `aggregate`, `transform`)
  * are CodegenFallback: every element round-trips through boxed objects
  * and interpreted lambda evaluation. For a 64-dim dot product inside a
  * pairwise similarity join that is the entire query cost (measured:
  * q34 at sf0.1 spent ~170 s in HOF evaluation). This expression
  * generates a tight primitive `double` loop over the two ArrayData
  * buffers — no boxing, stays inside whole-stage codegen — and the
  * summation order is the same left-to-right fold as both the HOF form
  * and DuckDB's list_reduce, so results stay bit-identical to the
  * oracle.
  */
final case class DotProductF64(left: Expression, right: Expression)
    extends BinaryExpression {

  // Inputs must be array<double>; call sites ([[VectorFunctions]])
  // cast explicitly, so no ExpectsInputTypes contract is needed (that
  // trait's AbstractDataType is private[sql] in Spark 4).
  override def dataType: DataType = DoubleType
  override def prettyName: String = "dot_f64"

  override def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    val n = math.min(x.numElements(), y.numElements())
    var s = 0.0
    var i = 0
    while (i < n) {
      s += x.getDouble(i) * y.getDouble(i)
      i += 1
    }
    s
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val i = ctx.freshName("i")
      val n = ctx.freshName("n")
      val s = ctx.freshName("s")
      s"""
         |int $n = java.lang.Math.min($a.numElements(), $b.numElements());
         |double $s = 0.0;
         |for (int $i = 0; $i < $n; $i++) {
         |  $s += $a.getDouble($i) * $b.getDouble($i);
         |}
         |${ev.value} = $s;
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}

object VectorFunctions {

  /** Codegen'd dot product over two array<double> columns. */
  def dotD(a: Column, b: Column): Column =
    Bridge.column(DotProductF64(
      Bridge.expression(a), Bridge.expression(b)))

  /** Cosine similarity over float/double array columns: casts to
    * array<double> (exact), then dot / (‖a‖·‖b‖) — one division, same
    * tree as the DuckDB oracle. */
  def cosineD(a: Column, b: Column): Column = {
    val ac = a.cast("array<double>")
    val bc = b.cast("array<double>")
    dotD(ac, bc) / (sqrt(dotD(ac, ac)) * sqrt(dotD(bc, bc)))
  }
}
