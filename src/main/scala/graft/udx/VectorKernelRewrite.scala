package graft.udx

import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.types.{ArrayType, DoubleType, FloatType}

/** Optimizer rule (`injectOptimizerRule` via GraftExtensions): rewrites
  * the declarative higher-order-function dot-product idiom
  *
  *   aggregate(zip_with(toDouble(a), toDouble(b), (x, y) => x * y),
  *             0.0, (acc, x) => acc + x)
  *
  * over `array<float>` columns into the codegen'd kernel
  * `graft_fdot(a, b)` (FloatDotExpression). The kernel folds
  * left-to-right in double exactly like the HOF chain (UdxSpec pins
  * bit-identical results), so this is a pure physical substitution:
  * users keep writing the catalog-function formulation, the engine
  * drops the interpreted per-element lambda dispatch and the
  * double-cast array materialization. The match is deliberately
  * conservative — any deviation from the exact idiom is left alone.
  */
object VectorKernelRewrite extends Rule[LogicalPlan] {

  /** `transform(base, x -> cast(x as double))` over array<float> → base */
  private def asFloatArray(e: Expression): Option[Expression] = e match {
    case ArrayTransform(base,
        LambdaFunction(c: Cast, Seq(arg: NamedLambdaVariable), _))
        if c.child.isInstanceOf[NamedLambdaVariable] &&
           c.child.asInstanceOf[NamedLambdaVariable].exprId == arg.exprId &&
           c.dataType == DoubleType &&
           (base.dataType match {
             case ArrayType(FloatType, _) => true
             case _ => false
           }) =>
      Some(base)
    case _ => None
  }

  private def isElementwiseProduct(f: Expression): Boolean = f match {
    case LambdaFunction(Multiply(x: NamedLambdaVariable, y: NamedLambdaVariable, _),
        Seq(a: NamedLambdaVariable, b: NamedLambdaVariable), _) =>
      x.exprId == a.exprId && y.exprId == b.exprId
    case _ => false
  }

  private def isSumMerge(f: Expression): Boolean = f match {
    case LambdaFunction(Add(acc: NamedLambdaVariable, x: NamedLambdaVariable, _),
        Seq(a: NamedLambdaVariable, b: NamedLambdaVariable), _) =>
      acc.exprId == a.exprId && x.exprId == b.exprId
    case _ => false
  }

  private def isIdentityFinish(f: Expression): Boolean = f match {
    case LambdaFunction(v: NamedLambdaVariable, Seq(a: NamedLambdaVariable), _) =>
      v.exprId == a.exprId
    case _ => false
  }

  override def apply(plan: LogicalPlan): LogicalPlan =
    plan.transformAllExpressions {
      case agg @ ArrayAggregate(ZipWith(l, r, prod), Literal(0.0, DoubleType), merge, finish)
          if isElementwiseProduct(prod) && isSumMerge(merge) && isIdentityFinish(finish) =>
        (asFloatArray(l), asFloatArray(r)) match {
          case (Some(a), Some(b)) => FloatDotExpression(a, b)
          case _ => agg
        }
    }
}
