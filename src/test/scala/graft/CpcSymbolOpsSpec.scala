package graft

import graft.functions.CpcSymbolOps._
import graft.operators.CpcTitleParser
import org.apache.spark.sql.functions.col
import org.apache.spark.sql.Row
import org.scalacheck.Gen

/** Vectors from reference tests/test_parser.py:25-203 (parse_symbol,
  * parse_line, edge cases), plus property tests (raw scalacheck Gen — the
  * scalatestplus bridge isn't on the offline classpath). */
class CpcSymbolOpsSpec extends GraftSpec {
  import spark.implicits._

  private def components(sym: String): (Option[String], Option[String], Option[String], Option[String]) = {
    val r = Seq(sym).toDF("symbol")
      .select(section(col("symbol")), cpcClass(col("symbol")),
        cpcSubclass(col("symbol")), subgroup(col("symbol")))
      .collect()(0)
    def o(i: Int) = Option(r.getString(i))
    (o(0), o(1), o(2), o(3))
  }

  test("parse_symbol vectors from reference tests") {
    assert(components("A") == (Some("A"), None, None, None))
    assert(components("A01") == (Some("A"), Some("A01"), None, None))
    assert(components("A01B") == (Some("A"), Some("A01"), Some("A01B"), None))
    assert(components("A01B1/00") == (Some("A"), Some("A01"), Some("A01B"), Some("A01B1/00")))
    assert(components("") == (None, None, None, None))
    assert(components("123") == (None, None, None, None))
    assert(components("Y02E") == (Some("Y"), Some("Y02"), Some("Y02E"), None))
  }

  test("valid format predicate (validator.py:211-228)") {
    val got = Seq("A", "A01", "A01B1/00", "Y02E", "", "1A", "AXX", "Z01", "Ab")
      .toDF("s").select(col("s"), validFormat(col("s")).as("v"))
      .collect().map(r => r.getString(0) -> r.getBoolean(1)).toMap
    assert(got("A")); assert(got("A01")); assert(got("A01B1/00")); assert(got("Y02E"))
    assert(!got("")); assert(!got("1A")); assert(!got("AXX")); assert(!got("Z01"))
    // len<3 symbols skip the digit check entirely (validator.py:226-227)
    assert(got("Ab"))
  }

  private def parseLine(line: String): Option[Row] =
    CpcTitleParser.parseLines(Seq(line).toDF("line")).collect().headOption

  test("parse_line level form") {
    val r = parseLine("A01B1/00 0 Hand tools").get
    assert(r.getString(0) == "A01B1/00" && r.getDouble(1) == 0.0 &&
      r.getString(2) == "Hand tools" && r.getString(3) == "A" &&
      r.getString(4) == "A01" && r.getString(5) == "A01B")
  }

  test("parse_line drops empty and invalid lines") {
    assert(parseLine("").isEmpty)
    assert(parseLine("Invalid Line").isEmpty) // lowercase chars break [A-Z0-9/]+
  }

  test("parse_line with parentheses and semicolons") {
    val p = parseLine("A01B1/00 0 Hand tools (edge trimmers for lawns A01G3/06)").get
    assert(p.getString(2) == "Hand tools (edge trimmers for lawns A01G3/06)")
    val s = parseLine("A01B1/02 1 Spades; Shovels; Hoes").get
    assert(s.getDouble(1) == 1.0 && s.getString(2) == "Spades; Shovels; Hoes")
  }

  test("parse_line fallback form leaves level null") {
    val r = parseLine("A01 AGRICULTURE; FORESTRY").get
    assert(r.getString(0) == "A01" && r.isNullAt(1) && r.getString(2) == "AGRICULTURE; FORESTRY")
  }

  test("greedy backtracking parity: digit-leading title consumed as level") {
    val r = parseLine("A01 2000 Stuff").get
    assert(r.getDouble(1) == 2000.0 && r.getString(2) == "Stuff")
  }

  val symGen: Gen[String] = for {
    sec <- Gen.oneOf("ABCDEFGHY".toSeq)
    cls <- Gen.choose(0, 99).map(n => f"$n%02d")
    sub <- Gen.oneOf("", "B", "L")
    grp <- Gen.oneOf("", "1/00", "3/087")
  } yield s"$sec$cls$sub$grp"

  test("property: components are prefixes of the symbol; section is first char") {
    val syms = Gen.listOfN(60, symGen).sample.get.distinct
    val rows = syms.toDF("symbol")
      .select(col("symbol"), section(col("symbol")), cpcClass(col("symbol")),
        cpcSubclass(col("symbol")), subgroup(col("symbol")))
      .collect()
    rows.foreach { r =>
      val sym = r.getString(0)
      def o(i: Int) = Option(r.getString(i))
      assert(o(1).contains(sym.take(1)))
      assert(o(2).forall(c => sym.startsWith(c) && c.length == 3))
      assert(o(3).forall(s => sym.startsWith(s) && s.length == 4))
      assert(o(4).forall(_ == sym))
    }
  }

  test("SQL function surface == column surface (CpcFunctions runtime route)") {
    graft.functions.CpcFunctions.register(spark)
    val syms = Seq("A", "A01", "A01B", "A01B1/00", "", "123", "Y02E", "Ab",
      "1A", "AXX", "Z01", "B23K9/00", "A 01")
    syms.toDF("symbol").createOrReplaceTempView("cpc_fn_syms")
    val viaSql = spark.sql(
      """SELECT cpc_section(symbol), cpc_class(symbol), cpc_subclass(symbol),
        |  cpc_subgroup(symbol), cpc_valid_format(symbol), cpc_normalize(symbol)
        |FROM cpc_fn_syms""".stripMargin).collect().map(_.toSeq).toSeq
    val viaCol = syms.toDF("symbol").select(
      section(col("symbol")), cpcClass(col("symbol")),
      cpcSubclass(col("symbol")), subgroup(col("symbol")),
      validFormat(col("symbol")), normalizeSymbol(col("symbol")))
      .collect().map(_.toSeq).toSeq
    assert(viaSql == viaCol)
  }
}
