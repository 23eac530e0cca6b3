package graft

import graft.expressions.{CosineSimilarity, DotProduct}
import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Cast, Expression, ExpressionInfo}
import org.apache.spark.sql.types.{ArrayType, DoubleType}

/** Session extension registering the engine's native expressions as SQL
  * functions at session build time:
  *
  * {{{
  *   SparkSession.builder()
  *     .config("spark.sql.extensions", "graft.GraftExtensions")
  *     ...
  * }}}
  *
  * (Runtime alternative: `VectorFunctions.register(spark)`.)
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  private def d(x: Expression): Expression = Cast(x, ArrayType(DoubleType))

  override def apply(ext: SparkSessionExtensions): Unit = {
    ext.injectPlannerStrategy(_ => graft.plans.AsOfJoinStrategy)
    ext.injectOptimizerRule(_ => graft.optimizer.NativeKernelRule)
    ext.injectFunction((
      FunctionIdentifier("vec_dot"),
      new ExpressionInfo(classOf[DotProduct].getName, "vec_dot"),
      (xs: Seq[Expression]) => DotProduct(d(xs(0)), d(xs(1)))))
    ext.injectFunction((
      FunctionIdentifier("cosine_sim"),
      new ExpressionInfo(classOf[CosineSimilarity].getName, "cosine_sim"),
      (xs: Seq[Expression]) => CosineSimilarity(d(xs(0)), d(xs(1)))))
  }
}
