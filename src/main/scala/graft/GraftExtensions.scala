package graft

import graft.expressions.{CosineSimilarity, DecodeHtmlNumRefs, DotProduct, JaroWinkler, RollingHash, ShingleHashes, SortedIntersectCount, TextStats}
import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Cast, Expression, ExpressionInfo, Literal}
import org.apache.spark.sql.types.{ArrayType, DoubleType, StringType}

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
    // text kernels — SQL: rolling_hash(text), shingle_hashes(text, n),
    // text_stats(text), sorted_intersect_count(a, b)
    ext.injectFunction((
      FunctionIdentifier("rolling_hash"),
      new ExpressionInfo(classOf[RollingHash].getName, "rolling_hash"),
      (xs: Seq[Expression]) => RollingHash(Cast(xs(0), StringType))))
    ext.injectFunction((
      FunctionIdentifier("decode_html_num_refs"),
      new ExpressionInfo(classOf[DecodeHtmlNumRefs].getName,
        "decode_html_num_refs"),
      (xs: Seq[Expression]) => DecodeHtmlNumRefs(Cast(xs(0), StringType))))
    ext.injectFunction((
      FunctionIdentifier("shingle_hashes"),
      new ExpressionInfo(classOf[ShingleHashes].getName, "shingle_hashes"),
      (xs: Seq[Expression]) => {
        // n must be a compile-time constant; accept any foldable integral
        // expression (at resolution time `1+2` is still Add, not Literal)
        val n = xs(1) match {
          case e if e.foldable => e.eval() match {
            case i: Int => i
            case l: Long => l.toInt
            case s: Short => s.toInt
            case b: Byte => b.toInt
            case other => throw new IllegalArgumentException(
              s"shingle_hashes(text, n): n must be an integer constant, got $other")
          }
          case _ => throw new IllegalArgumentException(
            "shingle_hashes(text, n): n must be a constant")
        }
        ShingleHashes(Cast(xs(0), StringType), n)
      }))
    ext.injectFunction((
      FunctionIdentifier("text_stats"),
      new ExpressionInfo(classOf[TextStats].getName, "text_stats"),
      (xs: Seq[Expression]) => TextStats(Cast(xs(0), StringType))))
    ext.injectFunction((
      FunctionIdentifier("sorted_intersect_count"),
      new ExpressionInfo(classOf[SortedIntersectCount].getName, "sorted_intersect_count"),
      (xs: Seq[Expression]) => SortedIntersectCount(xs(0), xs(1))))
    ext.injectFunction((
      FunctionIdentifier("jaro_winkler"),
      new ExpressionInfo(classOf[JaroWinkler].getName, "jaro_winkler"),
      (xs: Seq[Expression]) =>
        JaroWinkler(Cast(xs(0), StringType), Cast(xs(1), StringType))))
    ext.injectFunction((
      FunctionIdentifier("compression_ratio"),
      new ExpressionInfo(classOf[graft.expressions.CompressionRatio].getName,
        "compression_ratio"),
      (xs: Seq[Expression]) =>
        graft.expressions.CompressionRatio(Cast(xs(0), StringType))))
    // CPC symbol surface — SQL: cpc_section(s), cpc_class(s), cpc_subclass(s),
    // cpc_subgroup(s), cpc_valid_format(s), cpc_normalize(s); same column
    // compositions as graft.functions.CpcSymbolOps, adapted at resolution time
    graft.functions.CpcFunctions.builders.foreach { case (name, b) =>
      ext.injectFunction((
        FunctionIdentifier(name),
        new ExpressionInfo(graft.functions.CpcFunctions.getClass.getName, name),
        b))
    }
    // web-crawl surface — SQL: html_main_text(html), canonical_url(url);
    // same column compositions as graft.operators.HtmlExtract
    graft.functions.WebFunctions.builders.foreach { case (name, b) =>
      ext.injectFunction((
        FunctionIdentifier(name),
        new ExpressionInfo(graft.functions.WebFunctions.getClass.getName, name),
        b))
    }
  }
}
