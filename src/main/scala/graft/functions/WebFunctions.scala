package graft.functions

import org.apache.spark.sql.{Column, SparkSession}
import org.apache.spark.sql.catalyst.expressions.{Cast, Expression}
import org.apache.spark.sql.graft.ColumnBridge
import org.apache.spark.sql.types.StringType

/** SQL surface for the web-crawl column API ([[graft.operators
  * .HtmlExtract]]): `html_main_text(html)` and `canonical_url(url)` as
  * SQL functions, the [[CpcFunctions]] discipline — the builders reuse
  * the Column compositions verbatim through [[ColumnBridge]], so the
  * planned trees (and therefore pruning/codegen behavior) are identical
  * on the SQL and column routes. No UDFs.
  *
  * Two registration routes, mirroring the vector/CPC kernels:
  *  - session build: `.config("spark.sql.extensions", "graft.GraftExtensions")`
  *  - runtime (driver-owned sessions): `WebFunctions.register(spark)`
  */
object WebFunctions {

  /** name -> builder over a pre-cast string child. */
  private[graft] val builders: Seq[(String, Seq[Expression] => Expression)] = {
    def col1(f: Column => Column): Seq[Expression] => Expression =
      xs => ColumnBridge.expressionEager(
        f(ColumnBridge.column(Cast(xs.head, StringType))))
    Seq(
      "html_main_text" -> col1(c => graft.operators.HtmlExtract.mainText(c)),
      "canonical_url" -> col1(graft.operators.HtmlExtract.canonicalizeUrl),
      // the directive must be a literal: robotsMetaHas builds the match
      // pattern from the string VALUE at plan time. Guard explicitly —
      // eval() on a column reference would throw an opaque analysis
      // error, and a NULL literal would silently gate on the token
      // "null" and admit every page
      "robots_meta_has" -> (xs => {
        require(xs(1).foldable,
          "robots_meta_has: the directive argument must be a literal")
        val d = xs(1).eval(null)
        require(d != null,
          "robots_meta_has: the directive argument must not be NULL")
        ColumnBridge.expressionEager(
          graft.operators.HtmlExtract.robotsMetaHas(
            ColumnBridge.column(Cast(xs.head, StringType)), d.toString))
      }))
  }

  /** Runtime registration for sessions the library doesn't build. */
  def register(spark: SparkSession): Unit = {
    val reg = spark.sessionState.functionRegistry
    builders.foreach { case (name, b) =>
      reg.createOrReplaceTempFunction(name, b, "scala_udf")
    }
  }
}
