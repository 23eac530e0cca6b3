package graft
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
object Q482Probe {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.autoBroadcastJoinThreshold", "64m")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val d = "/root/testdata/sf0.1"
    def time(label: String)(f: => Unit): Unit = {
      f
      val ts = (1 to 3).map { _ =>
        val t0 = System.nanoTime(); f; (System.nanoTime()-t0)/1e9 }
      println(f"PROBE $label ${ts.min}%.2f s")
    }
    val loc = "/tmp/q482probe"
    def rmTree(f: java.io.File): Unit = {
      Option(f.listFiles()).getOrElse(Array.empty).foreach(rmTree); f.delete(); () }
    val docs = spark.read.parquet(s"$d/documents.parquet")
    val pages = docs.select(col("doc_id"),
      graft.operators.HtmlExtract.syntheticPage(col("text")).as("html"))
      .localCheckpoint()
    time("export (8 shards, gz members)") {
      rmTree(new java.io.File(loc))
      graft.sources.WarcSource.exportWarc(pages, loc, 8, "warc2",
        bodyCol = "html", verify = false)
    }
    time("read records only") {
      graft.sources.WarcSource.records(spark, loc)
        .filter(_.warcType == "response").write.mode("overwrite")
        .format("noop").save()
    }
    time("read responseBodies") {
      graft.sources.WarcSource.responseBodies(spark, loc)
        .select("uri", "body").write.mode("overwrite").format("noop").save()
    }
    time("read + extract (no export)") {
      val landed = graft.sources.WarcSource.responseBodies(spark, loc)
        .select(regexp_extract(col("uri"), "/doc/(\\d+)$", 1)
          .cast("long").as("doc_id"), col("body").as("html"))
      graft.operators.HtmlExtract.extract(landed, "html")
        .select(col("doc_id"), length(col("text")))
        .write.mode("overwrite").format("noop").save()
    }
    time("extract only (no warc)") {
      graft.operators.HtmlExtract.extract(pages, "html")
        .select(col("doc_id"), length(col("text")))
        .write.mode("overwrite").format("noop").save()
    }
    spark.stop()
  }
}
