package graft.expressions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.graft.ColumnBridge
import org.apache.spark.sql.types.{DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** HTML numeric character references (`&#8212;` / `&#x27;`) decoded to
  * their codepoints, as ONE codegen'd expression.
  *
  * The declarative alternative — split on the ref pattern +
  * `regexp_extract_all` + a per-ref `transform` with UTF-16BE
  * unhex/decode surrogate arithmetic — is semantically identical but
  * inflates the per-block projection tree enough to push the whole
  * extraction out of tight codegen (measured on the q480 family:
  * 2-3.7× wall regression when it was inlined per block in round 19).
  * This expression generates a single static call instead, so
  * [[graft.operators.HtmlExtract]]'s per-block `cleanText` stays one
  * scan-speed projection.
  *
  * Semantics (spec-pinned, shared with the entity pipeline's ordering
  * — named set first, this, `&amp;` last):
  *   - `&#[0-9]{1,8};` decimal and `&#[xX][0-9a-fA-F]{1,6};` hex forms;
  *   - valid codepoints (0 < cp ≤ U+10FFFF, not a surrogate) decode,
  *     supplementary planes via the surrogate pair;
  *   - anything else — malformed digits, cp 0, surrogates, overflow —
  *     passes through as literal text;
  *   - inputs without "&#" return unchanged without even a toString
  *     (the common-block fast path).
  */
case class DecodeHtmlNumRefs(child: Expression) extends UnaryExpression {
  override def dataType: DataType = StringType
  override def prettyName: String = "decode_html_num_refs"

  override def nullSafeEval(input: Any): Any =
    DecodeHtmlNumRefs.decode(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.expressions.DecodeHtmlNumRefs.decode($c)")

  override protected def withNewChildInternal(c: Expression): Expression =
    copy(child = c)
}

object DecodeHtmlNumRefs {
  private val AmpHash = UTF8String.fromString("&#")
  private val Ref =
    java.util.regex.Pattern.compile("&#(?:[0-9]{1,8}|[xX][0-9a-fA-F]{1,6});")

  /** Called from generated code. */
  def decode(s: UTF8String): UTF8String = {
    if (!s.contains(AmpHash)) return s
    val js = s.toString
    val m = Ref.matcher(js)
    if (!m.find()) return s
    val sb = new java.lang.StringBuilder(js.length)
    var last = 0
    do {
      sb.append(js, last, m.start())
      val tok = m.group()
      val hex = tok.charAt(2) == 'x' || tok.charAt(2) == 'X'
      val digits = tok.substring(if (hex) 3 else 2, tok.length - 1)
      // digits are length-capped by the pattern, so parseLong cannot
      // overflow; range/surrogate checks gate the decode
      val cp = java.lang.Long.parseLong(digits, if (hex) 16 else 10)
      if (cp > 0L && cp <= 0x10FFFFL && !(cp >= 0xD800L && cp <= 0xDFFFL))
        sb.appendCodePoint(cp.toInt)
      else sb.append(tok)
      last = m.end()
    } while (m.find())
    sb.append(js, last, js.length)
    UTF8String.fromString(sb.toString)
  }

  def decode_html_num_refs(c: Column): Column =
    ColumnBridge.column(DecodeHtmlNumRefs(ColumnBridge.expression(c)))
}
