package graft.expressions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.GenericInternalRow
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.graft.ColumnBridge
import org.apache.spark.sql.types.{ArrayType, DataType, IntegerType, StringType, StructField, StructType}
import org.apache.spark.unsafe.types.UTF8String

/** The whole per-page block-statistics pass of
  * [[graft.operators.HtmlExtract.blockStats]] — noise-subtree strip,
  * block segmentation, per-block clean text / word count / link word
  * count, empty-block drop — as ONE codegen'd expression returning
  * `array<struct<text, words, link_words>>`.
  *
  * The declarative form ran the per-block work through interpreted
  * higher-order functions: `transform` over the split array with a
  * lambda of ~10 expressions per block, and `linkWordCount`'s nested
  * `aggregate` re-running the entity-decode chain per anchor — the
  * dominant cost of the q480/q482/q487 extraction pipelines once the
  * WARC read path went O(record) (measured: extraction 1.9 s of
  * q482's ~3.2 s at sf0.1). This expression is the DecodeHtmlNumRefs /
  * ParseAnchor promotion applied to the extraction hot path itself:
  * one static call per page.
  *
  * Semantics are pinned BY CONSTRUCTION: the kernel executes the same
  * java.util.regex patterns (same inline flags, compiled once), the
  * same sequential replace order, `Pattern.split(..., -1)` (Spark's
  * `split` keeps trailing empties), and the shared
  * [[DecodeHtmlNumRefs.decode]] / named-entity / whitespace chain the
  * Column form used — and the q480-family oracle rows plus the
  * planted-page specs hash-gate every rule.
  */
case class ExtractBlocks(child: Expression) extends UnaryExpression {
  override def dataType: DataType = ExtractBlocks.Schema
  override def prettyName: String = "extract_blocks"

  override def nullSafeEval(input: Any): Any =
    ExtractBlocks.blocks(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.expressions.ExtractBlocks.blocks($c)")

  override protected def withNewChildInternal(c: Expression): Expression =
    copy(child = c)
}

object ExtractBlocks {
  val Schema: ArrayType = ArrayType(StructType(Seq(
    StructField("text", StringType, nullable = false),
    StructField("words", IntegerType, nullable = false),
    StructField("link_words", IntegerType, nullable = false))),
    containsNull = false)

  // the EXACT pattern strings of HtmlExtract's column chain
  private val Comments = java.util.regex.Pattern.compile("(?s)<!--.*?-->")
  private val NoiseTags = Seq(
    "head", "script", "style", "noscript", "template", "svg", "iframe")
    .map(t => java.util.regex.Pattern.compile(s"(?is)<$t\\b[^>]*>.*?</$t>"))
  private val BlockTags =
    "p|div|h[1-6]|li|ul|ol|dl|dt|dd|table|thead|tbody|tfoot|tr|td|th|" +
      "article|section|header|footer|nav|aside|blockquote|pre|br|hr|" +
      "main|figure|figcaption|form|fieldset|address|summary|details"
  private val Split =
    java.util.regex.Pattern.compile(s"(?i)</?(?:$BlockTags)\\b[^>]*>")
  private val Anchor =
    java.util.regex.Pattern.compile("(?is)<a\\b[^>]*>(.*?)</a>")
  private val Tag = java.util.regex.Pattern.compile("<[^>]*>")
  private val Ws = java.util.regex.Pattern.compile("\\s+")

  /** stripNoise, verbatim order: comments first, then each noise tag
    * sequentially (each pass over the previous pass's output). */
  private def stripNoise(html: String): String =
    NoiseTags.foldLeft(Comments.matcher(html).replaceAll(" "))(
      (s, p) => p.matcher(s).replaceAll(" "))

  /** cleanText, verbatim order: tag strip → named set → numeric-ref/
    * `&amp;` kernel → whitespace normalize → space trim (Spark's `trim`
    * removes spaces only). */
  private[expressions] def cleanText(raw: String): String = {
    var t = Tag.matcher(raw).replaceAll(" ")
    t = t.replace("&lt;", "<").replace("&gt;", ">")
      .replace("&quot;", "\"").replace("&apos;", "'")
      .replace("&nbsp;", " ")
    t = DecodeHtmlNumRefs.decode(UTF8String.fromString(t)).toString
    t = Ws.matcher(t).replaceAll(" ")
    var i = 0
    var j = t.length
    while (i < j && t.charAt(i) == ' ') i += 1
    while (j > i && t.charAt(j - 1) == ' ') j -= 1
    t.substring(i, j)
  }

  /** `size(split(t, " "))` for nonempty normalized text: segments
    * between single spaces (consecutive spaces cannot occur after the
    * normalize pass; '' → 0 is handled by the caller's gate). */
  private def wordCount(t: String): Int = {
    if (t.isEmpty) return 0
    var n = 1
    var i = 0
    while (i < t.length) { if (t.charAt(i) == ' ') n += 1; i += 1 }
    n
  }

  /** Called from generated code. */
  def blocks(html: UTF8String): ArrayData = {
    val stripped = stripNoise(html.toString)
    val parts = Split.split(stripped, -1)
    val out = new java.util.ArrayList[AnyRef](parts.length)
    var bi = 0
    while (bi < parts.length) {
      val raw = parts(bi)
      val text = cleanText(raw)
      if (text.nonEmpty) {
        val words = wordCount(text)
        var linkWords = 0
        val am = Anchor.matcher(raw)
        while (am.find()) linkWords += wordCount(cleanText(am.group(1)))
        out.add(new GenericInternalRow(Array[Any](
          UTF8String.fromString(text), words, linkWords)))
      }
      bi += 1
    }
    new GenericArrayData(out.toArray)
  }

  def extract_blocks(c: Column): Column =
    ColumnBridge.column(ExtractBlocks(ColumnBridge.expression(c)))
}
