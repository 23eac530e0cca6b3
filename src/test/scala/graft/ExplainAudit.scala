package graft

/** Plan auditor: prints the formatted physical plan of selected queries so
  * pushdown/broadcast/codegen can be eyeballed.
  * `sbt "Test/runMain graft.ExplainAudit q02_filter_project ..."` */
object ExplainAudit {
  def main(args: Array[String]): Unit = {
    val spark = TestSpark.spark
    val names = if (args.nonEmpty) args.toSeq else Seq("q02_filter_project", "q05_nation_revenue")
    names.foreach { n =>
      println(s"########## $n")
      SparkEntry.queries(n)(spark, "/root/testdata/sf0.01").explain("formatted")
    }
    spark.stop()
  }
}
