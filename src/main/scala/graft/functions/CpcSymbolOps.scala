package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** CPC symbol decomposition and format validation as pure Catalyst column
  * expressions.
  *
  * Semantics mirror the reference's `parse_symbol` (reference:
  * src/cpc_etl/parser.py:13-41) and `_is_valid_symbol_format` (reference:
  * src/cpc_etl/validator.py:211-228), re-expressed as codegen'd built-in
  * expressions — no UDFs, no closures — so the whole decomposition stays
  * inside whole-stage codegen and Catalyst can prune/push around it.
  *
  * SCALE: every function here is a narrow per-row projection — zero shuffle,
  * zero driver involvement, safe at any data size.
  *
  * Unicode notes: Python's `str.isalpha`/`str.isdigit` are unicode-aware, so
  * we use `\p{L}` / `\p{Nd}` (supported by both Java regex and RE2, keeping
  * the DuckDB oracle expressible) rather than ASCII-only `[A-Za-z]`/`\d`.
  */
object CpcSymbolOps {

  /** Guard from parser.py:22-23 — empty or all-digit symbol has no
    * components at all. */
  def degenerate(symbol: Column): Column =
    symbol.isNull || symbol === "" || symbol.rlike("^\\p{Nd}+$")

  private def guarded(symbol: Column, component: Column): Column =
    when(degenerate(symbol), lit(null).cast("string")).otherwise(component)

  /** First char when alphabetic (parser.py:26-27). e.g. "A01B1/00" -> "A". */
  def section(symbol: Column): Column =
    guarded(symbol, when(substring(symbol, 1, 1).rlike("^\\p{L}$"), substring(symbol, 1, 1)))

  /** Chars 1-3 when chars 2-3 are digits (parser.py:30-31); the reference
    * calls this "subsection" internally but emits it as output column
    * `class` (parser.py:70). e.g. "A01B" -> "A01". */
  def cpcClass(symbol: Column): Column =
    guarded(symbol, when(substring(symbol, 2, 2).rlike("^\\p{Nd}{2}$"), substring(symbol, 1, 3)))

  /** Chars 1-4 when char 4 is alphabetic (parser.py:34-35); reference-internal
    * "group", emitted as output column `subclass` (parser.py:71). */
  def cpcSubclass(symbol: Column): Column =
    guarded(symbol, when(substring(symbol, 4, 1).rlike("^\\p{L}$"), substring(symbol, 1, 4)))

  /** Full symbol when it contains '/' (parser.py:38-39). Computed by the
    * reference then dropped from the output record (parser.py:65-72); kept
    * here for API parity. */
  def subgroup(symbol: Column): Column =
    guarded(symbol, when(symbol.contains("/"), symbol))

  /** Format predicate from validator.py:211-228: nonempty, first char
    * alphabetic AND in ABCDEFGHY, and (len>=3 implies chars 2-3 digits).
    * Note the reference checks `symbol[0].isalpha()` before the ABCDEFGHY
    * membership; since the allowed letters are a subset of alpha, one rlike
    * covers both. */
  def validFormat(symbol: Column): Column =
    symbol.isNotNull &&
      symbol.rlike("^[ABCDEFGHY]") &&
      (length(symbol) < 3 || substring(symbol, 2, 2).rlike("^\\p{Nd}{2}$"))

  /** Whitespace normalization used across all three dim loaders
    * (validator.py:91, :124, :167): `"".join(s.split())` removes ALL
    * whitespace, not just leading/trailing. */
  def normalizeSymbol(symbol: Column): Column =
    regexp_replace(symbol, "\\s+", "")
}
