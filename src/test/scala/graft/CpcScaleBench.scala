package graft

import graft.operators.{CpcPipeline, CpcValidator}
import org.apache.spark.sql.functions._

/** Reference-workload-scale drive: validate a CPC-universe-sized symbol set
  * (~267k symbols ≈ the real CPC scheme) through the broadcast-join
  * validator and report throughput. The reference does this as a
  * single-threaded Python loop over three dicts (reference: main.py:77-87);
  * tools/reference_loop_bench.py times a faithful stdlib twin of that loop
  * on the identical universe for the baseline comparison.
  *
  * `sbt "Test/runMain graft.CpcScaleBench"`
  */
object CpcScaleBench {
  val Sections = "ABCDEFGHY"
  val NClasses = 99
  val Subs = "BCD"
  val NGroups = 100
  val Total: Long = Sections.length.toLong * NClasses * Subs.length * NGroups // 267_300

  def main(args: Array[String]): Unit = {
    val spark = TestSpark.spark

    // symbol(id) = sec + cls + sub + grp + "/00", all derived from id
    val secArr = array(Sections.map(c => lit(c.toString)): _*)
    val subArr = array(Subs.map(c => lit(c.toString)): _*)
    def symbolOf(id: org.apache.spark.sql.Column) = concat(
      element_at(secArr, (id / (NClasses * Subs.length * NGroups)).cast("int") + 1),
      lpad((id / (Subs.length * NGroups) % NClasses).cast("int").cast("string"), 2, "0"),
      element_at(subArr, (id / NGroups % Subs.length).cast("int") + 1),
      (id % NGroups).cast("string"), lit("/00"))
    def subclassOf(id: org.apache.spark.sql.Column) = concat(
      element_at(secArr, (id / (NClasses * Subs.length * NGroups)).cast("int") + 1),
      lpad((id / (Subs.length * NGroups) % NClasses).cast("int").cast("string"), 2, "0"),
      element_at(subArr, (id / NGroups % Subs.length).cast("int") + 1))

    val universe = spark.range(Total).select(col("id"), symbolOf(col("id")).as("symbol"),
      subclassOf(col("id")).as("parent"))
    val titles = universe.select("symbol")
    // dims: every 1000th symbol missing from the list; every 10th also in
    // the validity file; edges = group -> subclass (+ subclass chain)
    val symbolList = universe.where(col("id") % 1000 =!= 0)
      .select(col("symbol"), lit("ACTIVE").as("validity_status"))
    val validity = universe.where(col("id") % 10 === 0)
      .select(col("symbol"), lit("ACTIVE").as("validity_status"))
    val edges = universe.select(col("symbol"), col("parent").as("parent_symbol"))
      .union(universe.select(col("parent"), substring(col("parent"), 1, 3))).distinct()

    // the reference builds its lookup dicts once in initialize() BEFORE the
    // timed loop (validator.py:59-67); mirror that: dims cached + resident,
    // one warm validation for JIT/codegen, then the timed run
    Seq(titles, symbolList, validity, edges).foreach(df => { df.cache(); df.count() })
    def validateOnce() = CpcValidator.validate(titles, symbolList, validity, edges)
      .agg(count(lit(1)).as("total"),
        sum(when(CpcValidator.invalidCond, 1L).otherwise(0L)).as("invalid")).collect()(0)
    validateOnce()

    val t0 = System.nanoTime()
    val rep = validateOnce()
    val secs = (System.nanoTime() - t0) / 1e9
    val (total, invalid) = (rep.getLong(0), rep.getLong(1))
    val validated = CpcValidator.validate(titles, symbolList, validity, edges)
    println(f"== cpc_scale: validated $total symbols in $secs%.2f s " +
      f"(${total / secs / 1e3}%.0fk symbols/s), invalid=$invalid")
    assert(total == Total)
    assert(invalid == (Total + 999) / 1000, s"invalid=$invalid") // ids 0,1000,...
    // steady-state throughput: the broadcast-build fixed cost (3 dims
    // collected+hashed per query) amortizes over the fact stream — measure
    // with 10x facts against the same dims
    val bigTitles = spark.range(Total * 10)
      .select(symbolOf(col("id") % Total).as("symbol"))
    val tBig0 = System.nanoTime()
    val big = CpcValidator.validate(bigTitles, symbolList, validity, edges)
      .agg(count(lit(1)), sum(when(CpcValidator.invalidCond, 1L).otherwise(0L)))
      .collect()(0)
    val bigSecs = (System.nanoTime() - tBig0) / 1e9
    println(f"== cpc_scale: 10x facts: ${big.getLong(0)} rows in $bigSecs%.2f s " +
      f"(${big.getLong(0) / bigSecs / 1e6}%.2fM symbols/s), invalid=${big.getLong(1)}")
    assert(big.getLong(0) == Total * 10 && big.getLong(1) == 10 * ((Total + 999) / 1000))

    val t1 = System.nanoTime()
    val rep2 = CpcPipeline.report(validated)
    println(f"== cpc_scale: full report (incl top-10 sample) in ${(System.nanoTime() - t1) / 1e9}%.2f s, " +
      s"firstInvalid=${rep2.firstInvalid.take(2).map(_._1)}")
    spark.stop()
  }
}
