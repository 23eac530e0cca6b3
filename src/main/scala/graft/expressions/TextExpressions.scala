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

/** Distinct word-n-gram shingles as 64-bit hashes, in one codegen'd call:
  * split on single spaces, join each n-gram with single spaces,
  * order-preserving distinct, xxhash64 (seed 42 — same family the SQL
  * `xxhash64` uses) of the shingle's UTF-8 bytes.
  *
  * This replaces the typed `flatMap` shingle pass in the dedup operators:
  * that pass cost a Deserialize/MapPartitions/Serialize break in every
  * plan that touched shingles (and ran once per consumer). As an
  * Expression the generation stays inside whole-stage codegen, shingle
  * STRINGS are never materialized into rows (only their hashes), and the
  * downstream exchanges become structurally identical — so Catalyst
  * reuses one shuffle across document-frequency counting, the prefix
  * self-join, and set verification (ReuseExchange).
  *
  * Hash-distinct vs string-distinct differ only on a 64-bit collision
  * inside one document (~1e-15 at 1e4 shingles/doc) — the same odds the
  * hashed-set verification already accepts.
  */
case class ShingleHashes(child: Expression, n: Int) extends UnaryExpression {
  override def dataType: DataType = org.apache.spark.sql.types.ArrayType(LongType, containsNull = false)
  override def prettyName: String = "shingle_hashes"

  override def nullSafeEval(input: Any): Any =
    ShingleHashes.compute(input.asInstanceOf[UTF8String], n)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.expressions.ShingleHashes.compute($c, $n)")

  override protected def withNewChildInternal(c: Expression): Expression = copy(child = c)
}

object ShingleHashes {
  /** Called from generated code. Semantics identical to
    * `text.split(" ", -1).sliding(n).map(_.mkString(" ")).distinct` +
    * xxhash64, without building the intermediate gram strings twice. */
  def compute(text: UTF8String, n: Int): org.apache.spark.sql.catalyst.util.ArrayData = {
    val ws = text.toString.split(" ", -1)
    if (ws.length < n)
      return new org.apache.spark.sql.catalyst.util.GenericArrayData(Array.empty[Long])
    val seen = new java.util.LinkedHashSet[java.lang.Long]((ws.length - n + 1) * 2)
    val sb = new java.lang.StringBuilder
    var i = 0
    while (i <= ws.length - n) {
      sb.setLength(0)
      var j = 0
      while (j < n) {
        if (j > 0) sb.append(' ')
        sb.append(ws(i + j))
        j += 1
      }
      val h = org.apache.spark.sql.catalyst.expressions.XxHash64Function.hash(
        UTF8String.fromString(sb.toString), org.apache.spark.sql.types.StringType, 42L)
      seen.add(h)
      i += 1
    }
    val out = new Array[Long](seen.size)
    val it = seen.iterator()
    var k = 0
    while (it.hasNext) { out(k) = it.next(); k += 1 }
    new org.apache.spark.sql.catalyst.util.GenericArrayData(out)
  }

  def shingle_hashes(c: Column, n: Int): Column =
    ColumnBridge.column(ShingleHashes(ColumnBridge.expression(c.cast("string")), n))
}
