package graft.plans

import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.types.{ArrayType, DoubleType, FloatType}

/** Optimizer rule: fuse the declarative dot-product fold
  *
  * {{{ aggregate(zip_with(a, b, (x, y) => double(x) * double(y)), 0d, (acc, v) => acc + v) }}}
  *
  * into the native [[DotProductF]] whenever `a` and `b` are float arrays.
  * The rewrite is exact — DotProductF performs the same left-to-right
  * double accumulation — so results are bit-identical; only the execution
  * strategy changes (fused codegen loop vs per-element lambda dispatch,
  * ~4× measured on the embedding near-dup join).
  *
  * This is the escape hatch that lets pipeline authors keep writing the
  * portable declarative form ([[graft.functions.VectorFunctions.dotFold]])
  * and still get native speed when graft's extensions are installed
  * (`spark.sql.extensions=graft.plans.GraftExtensions`).
  */
object FuseDotProduct extends Rule[LogicalPlan] {

  private object DoubleOf {
    /** Matches x or cast(x as double) where x is float/double. */
    def unapply(e: Expression): Option[Expression] = e match {
      case Cast(x, DoubleType, _, _) => Some(x)
      case x if x.dataType == DoubleType => Some(x)
      case _ => None
    }
  }

  private def isFloatArray(e: Expression): Boolean = e.dataType match {
    case ArrayType(FloatType, _) => true
    case _ => false
  }

  override def apply(plan: LogicalPlan): LogicalPlan = plan.transformAllExpressions {
    case agg @ ArrayAggregate(
          ZipWith(left, right,
            LambdaFunction(Multiply(DoubleOf(x: NamedLambdaVariable), DoubleOf(y: NamedLambdaVariable), _), Seq(lx: NamedLambdaVariable, ly: NamedLambdaVariable), _)),
          zero,
          LambdaFunction(Add(acc: NamedLambdaVariable, v: NamedLambdaVariable, _), Seq(lacc: NamedLambdaVariable, lv: NamedLambdaVariable), _),
          LambdaFunction(fin: NamedLambdaVariable, Seq(lfin: NamedLambdaVariable), _))
        if isFloatArray(left) && isFloatArray(right) &&
          zero.foldable && zero.eval() == 0.0 &&
          x.exprId == lx.exprId && y.exprId == ly.exprId &&
          acc.exprId == lacc.exprId && v.exprId == lv.exprId &&
          fin.exprId == lfin.exprId =>
      DotProductF(left, right)
  }
}
