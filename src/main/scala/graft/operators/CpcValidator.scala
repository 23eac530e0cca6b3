package graft.operators

import graft.functions.CpcSymbolOps.validFormat
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Symbol validation re-expressed as broadcast joins (SURVEY §2.5 J1-J4,
  * §2.9 X10-X11).
  *
  * The reference validates per row in a single-threaded Python loop doing
  * three hash-map lookups (reference: src/cpc_etl/validator.py:176-209 driven
  * by main.py:77-87) — its main scalability cliff. Here the same semantics
  * are three left joins against broadcast dimension frames, so the titles
  * fact table streams through one codegen stage with ZERO shuffle:
  *
  *   - in_symbol_list:  membership in the symbol-list dim (J1)
  *   - validity_status: validity-file status overriding symbol-list status,
  *                      default "UNKNOWN" (J2 + the J4 last-writer-wins merge
  *                      via coalesce — validity file loads after and
  *                      overwrites, validator.py:64-66, :128-131)
  *   - schema_valid / parent_symbol: hierarchy edge lookup (J3)
  *   - symbol_valid:    format predicate X10, pure column
  *   - validation_warnings: ordered conditional message accumulation (X11,
  *                      validator.py:186-207 — order preserved exactly)
  *
  * SCALE: dims are true dimensions (≈260k rows, a few MB) — broadcast is
  * correct at 100 TB of facts; AQE would pick it anyway but we force it so
  * the plan never degrades to a sort-merge shuffle of the fact table.
  */
object CpcValidator {

  /** @param titles      fact frame with a `symbol` column
    * @param symbolList  (symbol, validity_status) from CpcDimSources.symbolList
    * @param validity    (symbol, validity_status) from CpcDimSources.validityFile
    * @param edges       (symbol, parent_symbol) from CpcDimSources.schemeEdges */
  def validate(titles: DataFrame, symbolList: DataFrame, validity: DataFrame,
      edges: DataFrame): DataFrame = {
    val sl = broadcast(symbolList
      .select(col("symbol"), col("validity_status").as("sl_status"))
      .withColumn("in_symbol_list", lit(true)))
    val vf = broadcast(validity
      .select(col("symbol"), col("validity_status").as("vf_status")))
    val ed = broadcast(edges.select(col("symbol"), col("parent_symbol")))

    val joined = titles
      .join(sl, Seq("symbol"), "left")
      .join(vf, Seq("symbol"), "left")
      .join(ed, Seq("symbol"), "left")

    val inList = coalesce(col("in_symbol_list"), lit(false))
    // J4: validity file overwrites symbol-list status; UNKNOWN when absent
    // from both (dict.get default, validator.py:195).
    val status = coalesce(col("vf_status"), col("sl_status"), lit("UNKNOWN"))
    val formatOk = validFormat(col("symbol"))
    val schemaOk = col("parent_symbol").isNotNull

    val warnings = array_compact(array(
      when(!formatOk, lit("Invalid symbol format")),
      when(!inList, lit("Symbol not found in symbol list")),
      when(status =!= "ACTIVE", concat(lit("Symbol status: "), status)),
      when(!schemaOk, lit("Symbol not found in schema hierarchy"))))

    joined
      .withColumn("symbol_valid", formatOk)
      .withColumn("in_symbol_list", inList)
      .withColumn("validity_status", status)
      .withColumn("schema_valid", schemaOk)
      .withColumn("validation_warnings", warnings)
      .drop("sl_status", "vf_status")
  }

  /** The publish gate predicate (F5): a symbol is invalid unless
    * format-valid AND in the symbol list AND ACTIVE
    * (main.py:79-83, orchestrator.py:103-107). */
  def invalidCond = !(col("symbol_valid") && col("in_symbol_list") &&
    col("validity_status") === "ACTIVE")
}
