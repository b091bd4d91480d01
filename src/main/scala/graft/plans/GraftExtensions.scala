package graft.plans

import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.types._
import graft.functions.VectorDot

/** Catalyst optimizer rule: rewrite the natural higher-order-function
  * dot-product pattern over float vectors,
  *
  *   aggregate(
  *     zip_with(transform(a, x -> double(x)), transform(b, y -> double(y)),
  *              (x, y) -> x * y),
  *     0.0d, (acc, v) -> acc + v)
  *
  * into the fused codegen kernel `graft.functions.VectorDot(a, b)`.
  * Users reach for the HOF form first; interpreted lambda dispatch
  * makes it ~8× slower on 10⁶-pair scans. The match is deliberately
  * exact-semantics-only: double multiplication, double left-fold from
  * zero — precisely VectorDot's loop (a float-typed multiply inside the
  * lambda would round differently and is NOT rewritten).
  *
  * Registered through SparkSessionExtensions (`injectOptimizerRule`):
  * `.config("spark.sql.extensions", "graft.plans.GraftExtensions")`.
  */
object VectorDotRewrite extends Rule[LogicalPlan] {

  /** transform(arr, v -> cast(v as double)) over array<float> → arr */
  private object FloatArrayToDouble {
    def unapply(e: Expression): Option[Expression] = e match {
      case ArrayTransform(arr,
        LambdaFunction(Cast(v: NamedLambdaVariable, DoubleType, _, _),
          Seq(a: NamedLambdaVariable), _))
        if v.exprId == a.exprId &&
          arr.dataType.isInstanceOf[ArrayType] &&
          arr.dataType.asInstanceOf[ArrayType].elementType == FloatType =>
        Some(arr)
      case _ => None
    }
  }

  private object MultiplyLambda {
    def unapply(lf: LambdaFunction): Boolean = lf match {
      case LambdaFunction(Multiply(x: NamedLambdaVariable,
        y: NamedLambdaVariable, _),
        Seq(a: NamedLambdaVariable, b: NamedLambdaVariable), _) =>
        (x.exprId == a.exprId && y.exprId == b.exprId) ||
          (x.exprId == b.exprId && y.exprId == a.exprId)
      case _ => false
    }
  }

  private object AddLambda {
    def unapply(lf: LambdaFunction): Boolean = lf match {
      case LambdaFunction(Add(x: NamedLambdaVariable,
        y: NamedLambdaVariable, _),
        Seq(a: NamedLambdaVariable, b: NamedLambdaVariable), _) =>
        (x.exprId == a.exprId && y.exprId == b.exprId) ||
          (x.exprId == b.exprId && y.exprId == a.exprId)
      case _ => false
    }
  }

  private object IdentityLambda {
    def unapply(lf: Expression): Boolean = lf match {
      case LambdaFunction(v: NamedLambdaVariable,
        Seq(a: NamedLambdaVariable), _) => v.exprId == a.exprId
      case _ => false
    }
  }

  override def apply(plan: LogicalPlan): LogicalPlan =
    plan.transformAllExpressions {
      case ArrayAggregate(
          ZipWith(FloatArrayToDouble(a), FloatArrayToDouble(b),
            mult: LambdaFunction),
          Literal(0.0d, DoubleType), merge: LambdaFunction, finish)
        if MultiplyLambda.unapply(mult) && AddLambda.unapply(merge) &&
          IdentityLambda.unapply(finish) =>
        VectorDot(a, b)
    }
}

/** Session-extension entry point:
  * `.config("spark.sql.extensions", "graft.plans.GraftExtensions")`.
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(e: SparkSessionExtensions): Unit = {
    e.injectOptimizerRule(_ => VectorDotRewrite)
    e.injectOptimizerRule(_ => SummaryRewrite)
  }
}
