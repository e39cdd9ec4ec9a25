package graft.functions

import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.types.{ArrayType, DoubleType}

/** Optimizer rule: rewrite the idiomatic higher-order-function dot
  * product
  *
  * {{{ aggregate(zip_with(a, b, (x, y) -> x * y), 0.0d, (acc, v) -> acc + v) }}}
  *
  * into the codegen'd [[DotProductF64]]. Users writing the natural HOF
  * form get the ~100× faster native loop without changing their code —
  * the same result bit-for-bit, since both evaluate a left-to-right
  * double fold. Registered via [[graft.GraftExtensions]]
  * (injectOptimizerRule).
  *
  * The match is deliberately conservative: element types must already
  * be double (the zip lambda multiplies the two lambda variables,
  * possibly under a no-op double cast), the zero must be literal 0.0,
  * the merge lambda must be `acc + v`, and the finish lambda must be
  * identity — anything else is left untouched.
  *
  * The rewrite is exact for ALL array<double> inputs, including
  * containsNull=true element types and unequal-length arrays:
  * [[DotProductF64]] null-propagates on length mismatch and null
  * elements, precisely matching the zip_with/aggregate null semantics
  * (pinned by GraftExtensionsSpec). A session-wide rule must never
  * change results for any input it matches.
  */
object DotProductRule extends Rule[LogicalPlan] {

  private object DirectOrCastVar {
    def unapply(e: Expression): Option[NamedLambdaVariable] = e match {
      case v: NamedLambdaVariable => Some(v)
      case Cast(v: NamedLambdaVariable, DoubleType, _, _) => Some(v)
      case _ => None
    }
  }

  private def isDoubleArray(e: Expression): Boolean = e.dataType match {
    case ArrayType(DoubleType, _) => true
    case _ => false
  }

  override def apply(plan: LogicalPlan): LogicalPlan =
    plan.transformAllExpressions {
      case agg @ ArrayAggregate(
          ZipWith(left, right,
            LambdaFunction(Multiply(DirectOrCastVar(x), DirectOrCastVar(y), _),
              Seq(zx: NamedLambdaVariable, zy: NamedLambdaVariable), _)),
          // bit-pattern guard, not just the 0.0 constant pattern:
          // Scala's numeric pattern equality treats -0.0 == 0.0, but a
          // -0.0 zero is observable (empty arrays fold to -0.0 in the
          // HOF form vs +0.0 in DotProductF64) and a session-wide rule
          // must be bit-exact for everything it matches
          zero @ Literal(0.0, DoubleType),
          LambdaFunction(Add(DirectOrCastVar(acc), DirectOrCastVar(v), _),
            Seq(ma: NamedLambdaVariable, mv: NamedLambdaVariable), _),
          LambdaFunction(fin: NamedLambdaVariable, Seq(ff: NamedLambdaVariable), _))
          if isDoubleArray(left) && isDoubleArray(right) &&
            java.lang.Double.doubleToRawLongBits(
              zero.value.asInstanceOf[Double]) == 0L &&
            x.exprId == zx.exprId && y.exprId == zy.exprId &&
            acc.exprId == ma.exprId && v.exprId == mv.exprId &&
            fin.exprId == ff.exprId &&
            agg.dataType == DoubleType =>
        DotProductF64(left, right)
    }
}
