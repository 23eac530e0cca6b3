package graft.optimizer

import graft.expressions.FoldDotProduct
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.types.{ArrayType, DoubleType}

/** Optimizer rule: recognize the declarative dot-product fold
  *
  * {{{ aggregate(zip_with(a, b, (x, y) => x * y), 0.0D, (acc, x) => acc + x) }}}
  *
  * and substitute the codegen'd [[FoldDotProduct]] kernel. The HOF form is
  * what a user naturally writes (and what `Similarity.dotHof` specs); it is
  * interpreted per element — lambda dispatch, boxed accumulator, and a
  * CodegenFallback that breaks whole-stage codegen. The kernel is a tight
  * primitive loop with IDENTICAL semantics: same index-order summation,
  * NULL when lengths differ (zip_with pads with null) or any element is
  * null (null poisons the fold). Because the semantics match exactly, the
  * rewrite is unconditional — no guard expression.
  *
  * `cosine_sim` written as HOF folds rewrites three times over
  * (dot / (sqrt(dot)·sqrt(dot))) with no extra handling.
  *
  * Registered at session build via GraftExtensions
  * (`injectOptimizerRule`), or on a live session with [[install]]
  * (`spark.experimental.extraOptimizations`).
  */
object NativeKernelRule extends Rule[LogicalPlan] {

  private def sameVar(ref: Expression, formal: NamedExpression): Boolean =
    (ref, formal) match {
      case (x: NamedLambdaVariable, y: NamedLambdaVariable) => x.exprId == y.exprId
      case _ => false
    }

  private def doubleArray(e: Expression): Boolean = e.dataType match {
    case ArrayType(DoubleType, _) => true
    case _ => false
  }

  /** zip_with(a, b, (x, y) => x * y) over array<double>, either operand
    * order in the multiply. */
  private object ElementwiseProduct {
    def unapply(e: Expression): Option[(Expression, Expression)] = e match {
      case ZipWith(l, r, LambdaFunction(Multiply(mx, my, _),
          Seq(vx: NamedLambdaVariable, vy: NamedLambdaVariable), _))
          if doubleArray(l) && doubleArray(r) &&
            ((sameVar(mx, vx) && sameVar(my, vy)) ||
              (sameVar(mx, vy) && sameVar(my, vx))) =>
        Some((l, r))
      case _ => None
    }
  }

  override def apply(plan: LogicalPlan): LogicalPlan =
    plan.transformAllExpressions {
      case ArrayAggregate(
          ElementwiseProduct(l, r),
          Literal(zero: Double, DoubleType),
          LambdaFunction(Add(ax, ay, _),
            Seq(acc: NamedLambdaVariable, x: NamedLambdaVariable), _),
          LambdaFunction(fin, Seq(fv: NamedLambdaVariable), _))
          if zero == 0.0 && sameVar(fin, fv) &&
            ((sameVar(ax, acc) && sameVar(ay, x)) ||
              (sameVar(ax, x) && sameVar(ay, acc))) =>
        FoldDotProduct(l, r)
    }

  /** Idempotently add the rule to a live session's optimizer. */
  def install(spark: SparkSession): Unit =
    if (!spark.experimental.extraOptimizations.contains(NativeKernelRule))
      spark.experimental.extraOptimizations =
        spark.experimental.extraOptimizations :+ NativeKernelRule
}
