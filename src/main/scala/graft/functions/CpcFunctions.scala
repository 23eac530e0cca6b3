package graft.functions

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.expressions.{Cast, Expression}
import org.apache.spark.sql.graft.ColumnBridge
import org.apache.spark.sql.types.StringType

/** SQL surface for the CPC column API: every [[CpcSymbolOps]] function as a
  * SQL function, so `spark.sql("SELECT cpc_section(symbol) ...")` matches
  * the column route exactly.
  *
  * The builders reuse the Column compositions verbatim (through
  * [[ColumnBridge]]): there is ONE implementation of each semantic, and the
  * SQL names are thin resolution-time adapters around it — the planned
  * expression trees are identical to the column API's, so codegen, pruning,
  * and pushdown behave the same on both routes. No UDFs anywhere.
  *
  * Two registration routes, mirroring the vector/text kernels:
  *  - session build: `.config("spark.sql.extensions", "graft.GraftExtensions")`
  *  - runtime (driver-owned sessions): `CpcFunctions.register(spark)`
  */
object CpcFunctions {

  /** name -> builder over pre-cast string children. */
  private[graft] val builders: Seq[(String, Seq[Expression] => Expression)] = {
    def col1(f: org.apache.spark.sql.Column => org.apache.spark.sql.Column)
        : Seq[Expression] => Expression =
      xs => ColumnBridge.expressionEager(
        f(ColumnBridge.column(Cast(xs.head, StringType))))
    Seq(
      "cpc_section" -> col1(CpcSymbolOps.section),
      "cpc_class" -> col1(CpcSymbolOps.cpcClass),
      "cpc_subclass" -> col1(CpcSymbolOps.cpcSubclass),
      "cpc_subgroup" -> col1(CpcSymbolOps.subgroup),
      "cpc_valid_format" -> col1(CpcSymbolOps.validFormat),
      "cpc_normalize" -> col1(CpcSymbolOps.normalizeSymbol))
  }

  /** Runtime registration for sessions the library doesn't build. */
  def register(spark: SparkSession): Unit = {
    val reg = spark.sessionState.functionRegistry
    builders.foreach { case (name, b) =>
      reg.createOrReplaceTempFunction(name, b, "scala_udf")
    }
  }
}
