package graft.expressions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.graft.ColumnBridge
import org.apache.spark.sql.types.{DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** HTML numeric character references (`&#8212;` / `&#x27;`) AND the
  * `&amp;` named entity decoded in ONE left-to-right scan, as one
  * codegen'd expression.
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
  * Folding `&amp;` into the same scan (round 20, ADVICE r19) is what
  * makes the pipeline genuinely single-pass: each token is decoded
  * exactly once and the scan resumes AFTER its output, so `&#38;amp;`
  * lands as `&amp;` and `&amp;lt;` as `&lt;` — never re-decoded, the
  * true browser semantics (a trailing global `&amp;`-replace pass
  * could re-read the output of a numeric decode).
  *
  * Semantics (spec-pinned; the named set `&lt;/&gt;/&quot;/&apos;/
  * &nbsp;` is decoded by the caller FIRST — none of their outputs
  * contain '&', so this scan stays single-pass):
  *   - `&#[0-9]{1,8};` decimal and `&#[xX][0-9a-fA-F]{1,6};` hex forms;
  *   - valid codepoints (0 < cp ≤ U+10FFFF, not a surrogate) decode,
  *     supplementary planes via the surrogate pair;
  *   - `&amp;` decodes to '&' (and the following text is NOT rescanned);
  *   - anything else — malformed digits, cp 0, surrogates, overflow —
  *     passes through as literal text;
  *   - inputs without "&#" or "&amp;" return unchanged without even a
  *     toString (the common-block fast path).
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
  private val AmpAmp = UTF8String.fromString("&amp;")
  private val Amp = UTF8String.fromString("&")
  private val Ref = java.util.regex.Pattern
    .compile("&#(?:[0-9]{1,8}|[xX][0-9a-fA-F]{1,6});|&amp;")

  /** Called from generated code. */
  def decode(s: UTF8String): UTF8String = {
    if (!s.contains(AmpHash)) {
      // no numeric refs: `&amp;` alone needs no regex — UTF8String's
      // non-overlapping left-to-right replace (which never rescans its
      // own output) IS the single-pass semantics, byte-level, no
      // toString. This is the COMMON block (escaped text carries
      // `&amp;` everywhere, numeric refs are sparse) — the r20 fold
      // must not charge it a regex pass.
      return if (s.contains(AmpAmp)) s.replace(AmpAmp, Amp) else s
    }
    val js = s.toString
    val m = Ref.matcher(js)
    if (!m.find()) return s
    val sb = new java.lang.StringBuilder(js.length)
    var last = 0
    do {
      sb.append(js, last, m.start())
      val tok = m.group()
      if (tok == "&amp;") sb.append('&')
      else {
        val hex = tok.charAt(2) == 'x' || tok.charAt(2) == 'X'
        val digits = tok.substring(if (hex) 3 else 2, tok.length - 1)
        // digits are length-capped by the pattern, so parseLong cannot
        // overflow; range/surrogate checks gate the decode
        val cp = java.lang.Long.parseLong(digits, if (hex) 16 else 10)
        if (cp > 0L && cp <= 0x10FFFFL && !(cp >= 0xD800L && cp <= 0xDFFFL))
          sb.appendCodePoint(cp.toInt)
        else sb.append(tok)
      }
      last = m.end()
    } while (m.find())
    sb.append(js, last, js.length)
    UTF8String.fromString(sb.toString)
  }

  def decode_html_num_refs(c: Column): Column =
    ColumnBridge.column(DecodeHtmlNumRefs(ColumnBridge.expression(c)))
}
