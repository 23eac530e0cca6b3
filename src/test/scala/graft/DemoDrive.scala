package graft

import graft.operators.CpcPipeline
import java.nio.file.Files

/** Sample-code drive of the public API (also used by /verify): builds the
  * reference-format fixture zips, runs the full parse→validate→gate→publish
  * pipeline, and prints the published snapshot. Run with
  * `sbt "Test/runMain graft.DemoDrive"`. */
object DemoDrive {
  def main(args: Array[String]): Unit = {
    val spark = TestSpark.spark
    val dir = CpcFixtures.dataDir()
    val v = CpcFixtures.Version
    val out = Files.createTempDirectory("cpc-demo-out")

    println(s"== fixtures in $dir, publishing to $out")
    val rep = CpcPipeline.run(spark, s"$dir/CPCTitleList$v.zip", dir.toString, v, out.toString)
    println(s"== report: total=${rep.total} invalid=${rep.invalid}")
    val published = spark.read.parquet(s"$out/cpc_schema_$v.parquet")
    published.orderBy("symbol").show(20, truncate = false)

    println("== driver smoke: SparkEntry.entry rows = " + SparkEntry.entry(spark).count())

    println("== probe: dirty titles must block publish")
    import spark.implicits._
    val dirty = Seq(("Z99", Option.empty[Double], "bogus", null: String, null: String, null: String))
      .toDF("symbol", "level", "title", "section", "class", "subclass")
    val rep2 = CpcPipeline.report(CpcPipeline.validateTitles(spark, dirty, dir.toString, v))
    println(s"== dirty report: invalid=${rep2.invalid} first=${rep2.firstInvalid}")

    println("== probe: missing dim zip")
    try {
      CpcPipeline.validateTitles(spark, dirty, "/tmp/nonexistent-dir-xyz", v).count()
      println("== missing dims: tolerated (no error)")
    } catch { case e: Exception => println(s"== missing dims raised: ${e.getClass.getSimpleName}: ${e.getMessage.linesIterator.next()}") }
    spark.stop()
  }
}
