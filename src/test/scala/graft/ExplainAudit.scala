package graft

/** Plan auditor: prints the formatted physical plan of selected queries so
  * pushdown/broadcast/codegen can be eyeballed.
  * `sbt "Test/runMain graft.ExplainAudit q02_filter_project ..."`
  *
  * With `--executed`, each query is RUN first and the final adaptive plan
  * is printed instead — the only form in which AQE's runtime decisions
  * (ReusedExchange insertion, broadcast conversions, coalesced shuffle
  * reads) are visible. */
object ExplainAudit {
  def main(args: Array[String]): Unit = {
    val spark = TestSpark.spark
    val executed = args.contains("--executed")
    val names0 = args.toSeq.filterNot(_.startsWith("--"))
    val names = if (names0.nonEmpty) names0 else Seq("q02_filter_project", "q05_nation_revenue")
    names.foreach { n =>
      println(s"########## $n")
      val df = SparkEntry.queries(n)(spark, "/root/testdata/sf0.01")
      if (executed) {
        df.collect()
        println(df.queryExecution.executedPlan.toString)
      } else df.explain("formatted")
    }
    spark.stop()
  }
}
