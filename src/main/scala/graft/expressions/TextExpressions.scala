package graft.expressions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.graft.ColumnBridge
import org.apache.spark.sql.types.{DataType, LongType}
import org.apache.spark.unsafe.types.UTF8String

/** Polynomial rolling-hash document fingerprint (Rabin-Karp shape):
  * h = fold(codepoints, 0, (a, c) => (a*31 + c) mod 1e9+7).
  *
  * Codegen'd primitive loop (no UDF); iterates unicode CODEPOINTS so the
  * DuckDB oracle (`list_reduce` over `unicode(char)`) computes the identical
  * value. The modulus keeps every intermediate below 2^35, so plain long
  * arithmetic is exact in both engines. Complements the md5 canonical
  * fingerprint (TextAnalysis.fingerprint) with an order-sensitive,
  * incremental-update-friendly hash.
  */
case class RollingHash(child: Expression) extends UnaryExpression {
  override def dataType: DataType = LongType
  override def prettyName: String = "rolling_hash"

  override def nullSafeEval(input: Any): Any =
    RollingHash.hash(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.expressions.RollingHash.hash($c)")

  override protected def withNewChildInternal(c: Expression): Expression = copy(child = c)
}

object RollingHash {
  /** Called from generated code. */
  def hash(s: UTF8String): Long = {
    val js = s.toString
    var h = 0L
    var i = 0
    while (i < js.length) {
      val cp = js.codePointAt(i)
      i += Character.charCount(cp)
      h = (h * 31L + cp) % 1000000007L
    }
    h
  }

  def rolling_hash(c: Column): Column =
    ColumnBridge.column(RollingHash(ColumnBridge.expression(c.cast("string"))))
}
