package graft.expressions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.GenericInternalRow
import org.apache.spark.sql.graft.ColumnBridge
import org.apache.spark.sql.types.{BooleanType, DataType, StringType, StructField, StructType}
import org.apache.spark.unsafe.types.UTF8String

/** One HTML anchor (`<a ...>...</a>`) parsed to
  * `struct<href, anchor, nofollow>` in a single compiled call — the
  * per-anchor half of [[graft.operators.HtmlExtract.links]].
  *
  * The declarative form ran ~15 interpreted expression dispatches per
  * anchor inside a higher-order `transform` lambda (opening-tag
  * extract, href extract, rel-nofollow match, tag strip, five named
  * entity replaces, the numeric-ref kernel, whitespace normalize,
  * trim), each with its own UTF8String↔String conversion — measured
  * ~20 µs/anchor at sf1 (4.1 s for 200k trivial anchors; links() runs
  * on EVERY landed page of a crawl, so this is frontier-path CPU at
  * 100 TB). This expression does the same work as one static call.
  *
  * Semantics are IDENTICAL by construction, not by reimplementation:
  * the kernel runs the SAME java.util.regex patterns the Column chain
  * used (same engine, same inline flags, compiled once per JVM), the
  * same named-replace ordering (non-overlapping left-to-right — Java
  * String.replace and Spark's StringReplace agree), and the same
  * [[DecodeHtmlNumRefs.decode]] single-scan entity kernel. The
  * URL-resolution when-chain (absolute/protocol-relative/site-
  * absolute/directory-relative + dot segments) stays column-level in
  * `links` — it runs on short hrefs, not page text.
  */
case class ParseAnchor(child: Expression) extends UnaryExpression {
  override def dataType: DataType = ParseAnchor.Schema
  override def prettyName: String = "parse_anchor"

  override def nullSafeEval(input: Any): Any =
    ParseAnchor.parse(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.expressions.ParseAnchor.parse($c)")

  override protected def withNewChildInternal(c: Expression): Expression =
    copy(child = c)
}

object ParseAnchor {
  val Schema: StructType = StructType(Seq(
    StructField("href", StringType, nullable = false),
    StructField("anchor", StringType, nullable = false),
    StructField("nofollow", BooleanType, nullable = false)))

  // the EXACT pattern strings the Column chain used — semantics pinned
  // to the same regex engine, not re-derived
  private val Open =
    java.util.regex.Pattern.compile("(?is)^<a\\b[^>]*>")
  private val Href =
    java.util.regex.Pattern.compile("(?is)\\bhref\\s*=\\s*[\"']([^\"']*)[\"']")
  private val Nofollow = java.util.regex.Pattern.compile(
    "(?is)\\brel\\s*=\\s*[\"'][^\"']*\\bnofollow\\b[^\"']*[\"']")

  /** Called from generated code. The anchor text goes through the
    * SHARED `cleanText` kernel ([[ExtractBlocks.cleanText]] — tag
    * strip → named set → numeric-ref/&amp; scan → whitespace
    * normalize → space trim), one implementation for both per-anchor
    * and per-block paths. */
  def parse(a: UTF8String): InternalRow = {
    val js = a.toString
    val om = Open.matcher(js)
    val openTag = if (om.find()) om.group() else ""
    val hm = Href.matcher(openTag)
    val href = if (hm.find()) hm.group(1) else ""
    val nofollow = Nofollow.matcher(openTag).find()
    new GenericInternalRow(Array[Any](
      UTF8String.fromString(href),
      UTF8String.fromString(ExtractBlocks.cleanText(js)),
      nofollow))
  }

  def parse_anchor(c: Column): Column =
    ColumnBridge.column(ParseAnchor(ColumnBridge.expression(c)))
}
