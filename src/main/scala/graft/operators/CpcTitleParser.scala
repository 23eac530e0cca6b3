package graft.operators

import graft.functions.CpcSymbolOps._
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Title-list line parsing as declarative column expressions.
  *
  * Mirrors the reference's `parse_line` (reference: src/cpc_etl/parser.py:43-72):
  * two anchored regexes — a level form `^([A-Z0-9/]+)\s+(\d+)\s+(.+)$` and a
  * fallback `^([A-Z0-9/]+)\s+(.+)$` — with non-matching and blank lines
  * dropped (parser.py:45-46, :56-59, :88-93). Output schema matches
  * parser.py:99-108: symbol STRING, level DOUBLE (nullable — the reference
  * deliberately casts int levels to Float64), title, section, class, subclass.
  *
  * SCALE: pure narrow ops (regexp_extract + when/substring) inside one
  * whole-stage-codegen span over a text scan; no shuffle, no UDF. At 100 TB
  * parallelism equals input-split count.
  */
object CpcTitleParser {

  /** Greedy-backtracking semantics are identical in Java and Python regex for
    * these patterns (e.g. "A01 2000 Stuff" parses as level=2000). */
  val LevelRe = "^([A-Z0-9/]+)\\s+([0-9]+)\\s+(.+)$"
  val FallbackRe = "^([A-Z0-9/]+)\\s+(.+)$"

  val TitlesSchema: StructType = StructType(Seq(
    StructField("symbol", StringType),
    StructField("level", DoubleType),
    StructField("title", StringType),
    StructField("section", StringType),
    StructField("class", StringType),
    StructField("subclass", StringType)))

  /** Parse a column of raw lines into the 6-column titles schema.
    * Rows whose (trimmed) line matches neither regex are dropped. */
  def parseLines(lines: DataFrame, lineCol: String = "line"): DataFrame = {
    val raw = trim(col(lineCol)) // reference strips before matching (parser.py:87)
    val hasLevel = raw.rlike(LevelRe)
    val hasFallback = raw.rlike(FallbackRe)
    val symbol = when(hasLevel, regexp_extract(raw, LevelRe, 1))
      .otherwise(regexp_extract(raw, FallbackRe, 1))
    val level: Column = when(hasLevel, regexp_extract(raw, LevelRe, 2).cast(DoubleType))
    val title = when(hasLevel, regexp_extract(raw, LevelRe, 3))
      .otherwise(regexp_extract(raw, FallbackRe, 2))
    lines
      .where(hasLevel || hasFallback)
      .select(
        symbol.as("symbol"),
        level.as("level"),
        title.as("title"),
        section(symbol).as("section"),
        cpcClass(symbol).as("class"),
        cpcSubclass(symbol).as("subclass"))
  }
}
