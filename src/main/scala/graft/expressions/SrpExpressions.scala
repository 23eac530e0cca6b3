package graft.expressions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression, XXH64}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.graft.ColumnBridge
import org.apache.spark.sql.types.{ArrayType, DataType, LongType}

/** All `tables` sign-random-projection bucket keys for a vector in ONE
  * native pass.
  *
  * The declarative form (Similarity.srpKeyHof) builds, per table×plane, an
  * interpreted `aggregate(zip_with(...))` fold — 48-96 lambda-interpreted
  * array traversals per row on the LSH hot path. This expression computes
  * the identical keys (bit-for-bit: same xxhash64-derived hyperplane
  * components, same index-order summation, same `> 0` sign rule, same bit
  * packing) in tight primitive loops, and stays inside whole-stage codegen
  * via a static call. Hyperplane component for (table t, plane p, dim i):
  * `pmod(xxhash64(t*131+p, i), 2001) - 1000`, exactly as the Column form —
  * xxhash64 seeds 42, hashes the int literal then the long index.
  */
case class SrpBucketKeys(child: Expression, tables: Int, planes: Int)
    extends UnaryExpression {
  require(tables > 0 && planes > 0 && planes < 64)

  override def prettyName: String = "srp_bucket_keys"
  override def dataType: DataType = ArrayType(LongType, containsNull = false)

  override protected def nullSafeEval(v: Any): Any =
    SrpBucketKeys.compute(v.asInstanceOf[ArrayData], tables, planes)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c =>
      s"graft.expressions.SrpBucketKeys.compute($c, $tables, $planes)")

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object SrpBucketKeys {
  /** Bit-identical to the HOF fold; called from generated code. */
  def compute(v: ArrayData, tables: Int, planes: Int): ArrayData = {
    val n = v.numElements()
    val keys = new Array[Long](tables)
    var t = 0
    while (t < tables) {
      var key = 0L
      var p = 0
      while (p < planes) {
        // xxhash64(lit(t*131+p), i): int literal hashed first, then index
        val seed = XXH64.hashInt(t * 131 + p, 42L)
        var proj = 0.0
        var i = 0
        while (i < n) {
          val h = XXH64.hashLong(i.toLong, seed)
          val comp = (((h % 2001L) + 2001L) % 2001L - 1000L).toDouble
          proj += v.getDouble(i) * comp
          i += 1
        }
        if (proj > 0) key |= 1L << p
        p += 1
      }
      keys(t) = key
      t += 1
    }
    new GenericArrayData(keys)
  }

  def srp_bucket_keys(vec: Column, tables: Int, planes: Int): Column =
    ColumnBridge.column(SrpBucketKeys(
      ColumnBridge.expression(vec.cast("array<double>")), tables, planes))
}
