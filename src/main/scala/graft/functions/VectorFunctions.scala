package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.functions._
import org.apache.spark.sql.graftbridge.Bridge
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType}

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
  *
  * Null semantics MATCH the higher-order form exactly (this matters
  * because [[DotProductRule]] rewrites user HOF expressions into this
  * one session-wide): `aggregate(zip_with(a,b,(x,y)->x*y),0.0,+)`
  * yields NULL when the arrays differ in length (zip_with pads the
  * shorter side with null, null*y -> null, acc+null -> null) or when
  * any element is null. The length check is one comparison; the
  * per-element null check is emitted only when an input's element type
  * is actually nullable, so the common containsNull=false hot loop
  * stays branch-free.
  */
final case class DotProductF64(left: Expression, right: Expression)
    extends BinaryExpression
    with org.apache.spark.sql.graftbridge.DeclaredInputTypes {

  // Scala call sites ([[VectorFunctions]]) cast explicitly, but the
  // SQL-registered dot_f64 has no such guarantee: without an input
  // contract an array<float> argument passes analysis and then
  // getDouble reads 8 bytes per 4-byte element — silently wrong
  // numbers, no exception. The (bridged) implicit-cast contract makes
  // the analyzer coerce array<float>→array<double> / reject
  // non-arrays at ANALYSIS time.
  override def declaredInputTypes: Seq[DataType] =
    Seq(ArrayType(DoubleType), ArrayType(DoubleType))
  override def dataType: DataType = DoubleType
  override def prettyName: String = "dot_f64"

  // Even with non-null inputs the result can be null (length mismatch).
  override def nullable: Boolean = true

  private def elementsNullable(e: Expression): Boolean = e.dataType match {
    case ArrayType(_, containsNull) => containsNull
    case _ => true
  }

  override def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    val n = x.numElements()
    if (n != y.numElements()) return null
    var s = 0.0
    var i = 0
    while (i < n) {
      if (x.isNullAt(i) || y.isNullAt(i)) return null
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
      val nullCheck =
        if (elementsNullable(left) || elementsNullable(right))
          s"""if ($a.isNullAt($i) || $b.isNullAt($i)) { ${ev.isNull} = true; break; }"""
        else ""
      s"""
         |int $n = $a.numElements();
         |if ($n != $b.numElements()) {
         |  ${ev.isNull} = true;
         |} else {
         |  double $s = 0.0;
         |  for (int $i = 0; $i < $n; $i++) {
         |    $nullCheck
         |    $s += $a.getDouble($i) * $b.getDouble($i);
         |  }
         |  if (!${ev.isNull}) ${ev.value} = $s;
         |}
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
