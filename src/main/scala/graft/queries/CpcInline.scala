package graft.queries

import graft.functions.CpcSymbolOps
import graft.operators.{CpcTitleParser, CpcValidator}
import org.apache.spark.sql.functions._

/** CPC-parity operators registered as oracle-checkable queries. The CPC
  * pipeline's real inputs are zip fixtures (covered by CpcSourcesSpec); for
  * the driver's DuckDB gate we run the SAME library code over inline VALUES
  * so both engines see identical rows. Test vectors come from the reference
  * suite (reference: tests/test_parser.py:25-203) plus the greedy-regex and
  * whitespace edge cases from SURVEY §7.4.
  */
object CpcInline {

  val titleLines: Seq[String] = Seq(
    "A AGRICULTURE",
    "A01 AGRICULTURE; FORESTRY; ANIMAL HUSBANDRY",
    "A01B SOIL WORKING IN AGRICULTURE OR FORESTRY",
    "A01B1/00 0 Hand tools (edge trimmers for lawns A01G3/06)",
    "A01B1/02 1 Spades; Shovels; Hoes",
    "A01 2000 Stuff",
    "Y02E REDUCTION OF GREENHOUSE GAS EMISSIONS",
    "Invalid Line",
    "",
    "  B23K  9  arc welding  ",
    "123 456 numeric title")

  val symbols: Seq[String] = Seq(
    "A", "A01", "A01B", "A01B1/00", "", "123", "Y02E", "Ab", "1A", "AXX",
    "Z01", "B23K9/00", "A 01")

  private def sqlValues(xs: Seq[String]): String =
    xs.map(x => s"('${x.replace("'", "''")}')").mkString(", ")

  private def sqlValuesBatched(batches: Seq[Seq[String]]): String =
    batches.zipWithIndex.flatMap { case (xs, b) =>
      xs.map(x => s"('${x.replace("'", "''")}', $b)")
    }.mkString(", ")

  /** The title lines split into two landing files for the incremental
    * ingest demo (q78): run 1 sees the first six lines, run 2 the rest. */
  private val titleBatches: Seq[Seq[String]] =
    Seq(titleLines.take(6), titleLines.drop(6))

  private val LvlRe = """^([A-Z0-9/]+)\s+([0-9]+)\s+(.+)$"""
  private val FbRe = """^([A-Z0-9/]+)\s+(.+)$"""

  /** symbol_valid format predicate in DuckDB terms (CpcSymbolOps.validFormat). */
  private def validFmt(c: String) =
    s"""(regexp_matches($c, '^[ABCDEFGHY]')
       | AND (length($c) < 3 OR regexp_matches(substring($c, 2, 2), '^\\p{Nd}{2}$$')))""".stripMargin

  // validation dims (exercise every branch: published/UNKNOWN statuses,
  // validity-file overwrite, absent symbols, hierarchy roots)
  private val valTitles = Seq("A", "A01", "A01B", "A01B1/00", "A01B1/02", "Y02E", "Z99", "123")
  private val valSymbolList = Seq(
    ("A", "ACTIVE"), ("A01", "ACTIVE"), ("A01B", "ACTIVE"),
    ("A01B1/00", "ACTIVE"), ("A01B1/02", "UNKNOWN"), ("Y02E", "ACTIVE"))
  private val valValidity = Seq(("A01B1/02", "ACTIVE"), ("B99X", "INACTIVE"))
  private val valEdges = Seq(
    ("A01", "A"), ("A01B", "A01"), ("A01B1/00", "A01B"), ("A01B1/02", "A01B1/00"))

  val all: Seq[Q] = Seq(

    // ---- title-line parsing through the library parser (X1-X6).
    Q("q40_cpc_parse",
      (s, _) => {
        import s.implicits._
        CpcTitleParser.parseLines(titleLines.toDF("line"))
          .orderBy("symbol", "title")
      },
      Some(s"""WITH raw(line) AS (VALUES ${sqlValues(titleLines)}),
              |t AS (SELECT trim(line) AS l FROM raw),
              |m AS (SELECT l,
              |  regexp_matches(l, '$LvlRe') AS haslvl,
              |  regexp_matches(l, '$FbRe') AS hasfb FROM t),
              |p AS (SELECT
              |  CASE WHEN haslvl THEN regexp_extract(l, '$LvlRe', 1)
              |       ELSE regexp_extract(l, '$FbRe', 1) END AS symbol,
              |  CASE WHEN haslvl THEN CAST(regexp_extract(l, '$LvlRe', 2) AS DOUBLE) END AS level,
              |  CASE WHEN haslvl THEN regexp_extract(l, '$LvlRe', 3)
              |       ELSE regexp_extract(l, '$FbRe', 2) END AS title
              |  FROM m WHERE haslvl OR hasfb)
              |SELECT symbol, level, title,
              |  CASE WHEN symbol = '' OR regexp_matches(symbol, '^\\p{Nd}+$$') THEN NULL
              |       WHEN regexp_matches(substring(symbol, 1, 1), '^\\p{L}$$')
              |       THEN substring(symbol, 1, 1) END AS section,
              |  CASE WHEN symbol = '' OR regexp_matches(symbol, '^\\p{Nd}+$$') THEN NULL
              |       WHEN regexp_matches(substring(symbol, 2, 2), '^\\p{Nd}{2}$$')
              |       THEN substring(symbol, 1, 3) END AS "class",
              |  CASE WHEN symbol = '' OR regexp_matches(symbol, '^\\p{Nd}+$$') THEN NULL
              |       WHEN regexp_matches(substring(symbol, 4, 1), '^\\p{L}$$')
              |       THEN substring(symbol, 1, 4) END AS subclass
              |FROM p ORDER BY symbol, title""".stripMargin)),

    // ---- symbol decomposition + format predicate (X2-X6, X10).
    Q("q41_cpc_components",
      (s, _) => {
        import s.implicits._
        symbols.toDF("symbol").select(
          col("symbol"),
          CpcSymbolOps.section(col("symbol")).as("section"),
          CpcSymbolOps.cpcClass(col("symbol")).as("class"),
          CpcSymbolOps.cpcSubclass(col("symbol")).as("subclass"),
          CpcSymbolOps.subgroup(col("symbol")).as("subgroup"),
          CpcSymbolOps.validFormat(col("symbol")).as("fmt_valid"))
          .orderBy("symbol")
      },
      Some(s"""WITH syms(symbol) AS (VALUES ${sqlValues(symbols)})
              |SELECT symbol,
              |  CASE WHEN symbol = '' OR regexp_matches(symbol, '^\\p{Nd}+$$') THEN NULL
              |       WHEN regexp_matches(substring(symbol, 1, 1), '^\\p{L}$$')
              |       THEN substring(symbol, 1, 1) END AS section,
              |  CASE WHEN symbol = '' OR regexp_matches(symbol, '^\\p{Nd}+$$') THEN NULL
              |       WHEN regexp_matches(substring(symbol, 2, 2), '^\\p{Nd}{2}$$')
              |       THEN substring(symbol, 1, 3) END AS "class",
              |  CASE WHEN symbol = '' OR regexp_matches(symbol, '^\\p{Nd}+$$') THEN NULL
              |       WHEN regexp_matches(substring(symbol, 4, 1), '^\\p{L}$$')
              |       THEN substring(symbol, 1, 4) END AS subclass,
              |  CASE WHEN symbol = '' OR regexp_matches(symbol, '^\\p{Nd}+$$') THEN NULL
              |       WHEN contains(symbol, '/') THEN symbol END AS subgroup,
              |  ${validFmt("symbol")} AS fmt_valid
              |FROM syms ORDER BY symbol""".stripMargin)),

    // ---- validation-as-joins (J1-J4 + X10-X11 + warnings order).
    Q("q42_cpc_validate",
      (s, _) => {
        import s.implicits._
        val titles = valTitles.toDF("symbol")
        val validated = CpcValidator.validate(titles,
          valSymbolList.toDF("symbol", "validity_status"),
          valValidity.toDF("symbol", "validity_status"),
          valEdges.toDF("symbol", "parent_symbol"))
        validated.select(
          col("symbol"), col("symbol_valid"), col("in_symbol_list"),
          col("validity_status"), col("schema_valid"), col("parent_symbol"),
          array_join(col("validation_warnings"), "|").as("warnings"))
          .orderBy("symbol")
      },
      Some(s"""WITH titles(symbol) AS (VALUES ${sqlValues(valTitles)}),
              |sl(symbol, sl_status) AS (VALUES ${valSymbolList.map(p => s"('${p._1}', '${p._2}')").mkString(", ")}),
              |vf(symbol, vf_status) AS (VALUES ${valValidity.map(p => s"('${p._1}', '${p._2}')").mkString(", ")}),
              |ed(symbol, parent_symbol) AS (VALUES ${valEdges.map(p => s"('${p._1}', '${p._2}')").mkString(", ")}),
              |j AS (SELECT t.symbol,
              |        ${validFmt("t.symbol")} AS symbol_valid,
              |        (sl.symbol IS NOT NULL) AS in_symbol_list,
              |        coalesce(vf.vf_status, sl.sl_status, 'UNKNOWN') AS validity_status,
              |        (ed.parent_symbol IS NOT NULL) AS schema_valid,
              |        ed.parent_symbol
              |      FROM titles t
              |      LEFT JOIN sl ON sl.symbol = t.symbol
              |      LEFT JOIN vf ON vf.symbol = t.symbol
              |      LEFT JOIN ed ON ed.symbol = t.symbol)
              |SELECT symbol, symbol_valid, in_symbol_list, validity_status,
              |  schema_valid, parent_symbol,
              |  coalesce(array_to_string(list_filter([
              |    CASE WHEN NOT symbol_valid THEN 'Invalid symbol format' END,
              |    CASE WHEN NOT in_symbol_list THEN 'Symbol not found in symbol list' END,
              |    CASE WHEN validity_status <> 'ACTIVE' THEN 'Symbol status: ' || validity_status END,
              |    CASE WHEN NOT schema_valid THEN 'Symbol not found in schema hierarchy' END
              |  ], x -> x IS NOT NULL), '|'), '') AS warnings
              |FROM j ORDER BY symbol""".stripMargin)),

    // ---- incremental title ingestion (streaming tier's oracle row): the
    // file-source stream + checkpoint processes each landed file exactly
    // once under Trigger.AvailableNow; output = q40's parse of the same
    // lines, plus which micro-batch ingested each row. A checkpoint bug
    // (re-processing or skipping a file) changes rows or batch_ids and
    // fails the hash compare.
    Q("q78_incremental_ingest",
      (s, _) => graft.streaming.EventsStream
        .incrementalIngestDemo(s, titleBatches)
        .orderBy("symbol", "title", "batch_id"),
      Some(s"""WITH raw(line, batch_id) AS (VALUES ${sqlValuesBatched(titleBatches)}),
              |t AS (SELECT trim(line) AS l, batch_id FROM raw),
              |m AS (SELECT l, batch_id,
              |  regexp_matches(l, '$LvlRe') AS haslvl,
              |  regexp_matches(l, '$FbRe') AS hasfb FROM t),
              |p AS (SELECT batch_id,
              |  CASE WHEN haslvl THEN regexp_extract(l, '$LvlRe', 1)
              |       ELSE regexp_extract(l, '$FbRe', 1) END AS symbol,
              |  CASE WHEN haslvl THEN CAST(regexp_extract(l, '$LvlRe', 2) AS DOUBLE) END AS level,
              |  CASE WHEN haslvl THEN regexp_extract(l, '$LvlRe', 3)
              |       ELSE regexp_extract(l, '$FbRe', 2) END AS title
              |  FROM m WHERE haslvl OR hasfb)
              |SELECT symbol, level, title,
              |  CASE WHEN symbol = '' OR regexp_matches(symbol, '^\\p{Nd}+$$') THEN NULL
              |       WHEN regexp_matches(substring(symbol, 1, 1), '^\\p{L}$$')
              |       THEN substring(symbol, 1, 1) END AS section,
              |  CASE WHEN symbol = '' OR regexp_matches(symbol, '^\\p{Nd}+$$') THEN NULL
              |       WHEN regexp_matches(substring(symbol, 2, 2), '^\\p{Nd}{2}$$')
              |       THEN substring(symbol, 1, 3) END AS "class",
              |  CASE WHEN symbol = '' OR regexp_matches(symbol, '^\\p{Nd}+$$') THEN NULL
              |       WHEN regexp_matches(substring(symbol, 4, 1), '^\\p{L}$$')
              |       THEN substring(symbol, 1, 4) END AS subclass,
              |  CAST(batch_id AS BIGINT) AS batch_id
              |FROM p ORDER BY symbol, title, batch_id""".stripMargin)),

    // ---- the CPC surface through SQL TEXT (parser → resolver → the
    // injected functions): the same CpcSymbolOps column compositions,
    // resolved by NAME via CpcFunctions (runtime route here, since the
    // driver owns this session; GraftExtensions injects identical builders
    // at session build). Oracle = q41's componentization + normalization,
    // so any drift between the SQL adapters and the column API flips the
    // hash.
    Q("q92_cpc_sql_functions",
      (s, _) => {
        import s.implicits._
        graft.functions.CpcFunctions.register(s)
        symbols.toDF("symbol").createOrReplaceTempView("cpc_syms")
        s.sql("""SELECT symbol,
                |  cpc_section(symbol) AS section,
                |  cpc_class(symbol) AS `class`,
                |  cpc_subclass(symbol) AS subclass,
                |  cpc_subgroup(symbol) AS subgroup,
                |  cpc_valid_format(symbol) AS fmt_valid,
                |  cpc_normalize(symbol) AS norm
                |FROM cpc_syms ORDER BY symbol""".stripMargin)
      },
      Some(s"""WITH syms(symbol) AS (VALUES ${sqlValues(symbols)})
              |SELECT symbol,
              |  CASE WHEN symbol = '' OR regexp_matches(symbol, '^\\p{Nd}+$$') THEN NULL
              |       WHEN regexp_matches(substring(symbol, 1, 1), '^\\p{L}$$')
              |       THEN substring(symbol, 1, 1) END AS section,
              |  CASE WHEN symbol = '' OR regexp_matches(symbol, '^\\p{Nd}+$$') THEN NULL
              |       WHEN regexp_matches(substring(symbol, 2, 2), '^\\p{Nd}{2}$$')
              |       THEN substring(symbol, 1, 3) END AS "class",
              |  CASE WHEN symbol = '' OR regexp_matches(symbol, '^\\p{Nd}+$$') THEN NULL
              |       WHEN regexp_matches(substring(symbol, 4, 1), '^\\p{L}$$')
              |       THEN substring(symbol, 1, 4) END AS subclass,
              |  CASE WHEN symbol = '' OR regexp_matches(symbol, '^\\p{Nd}+$$') THEN NULL
              |       WHEN contains(symbol, '/') THEN symbol END AS subgroup,
              |  ${validFmt("symbol")} AS fmt_valid,
              |  regexp_replace(symbol, '\\s+', '', 'g') AS norm
              |FROM syms ORDER BY symbol""".stripMargin)))
}
