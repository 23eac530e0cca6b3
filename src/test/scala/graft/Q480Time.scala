package graft

import org.apache.spark.sql.SparkSession

/** Timing drive for the q480 extraction family — used in round 19 to
  * attribute (and then verify the fix for) the numeric-entity decode
  * regression: the declarative split/extract_all/transform chain pushed
  * the per-block projection out of tight codegen (q480 2.0×, q482 3.7×,
  * q487 3.2× vs the r18-samples pin); the codegen'd
  * [[graft.expressions.DecodeHtmlNumRefs]] kernel restores the envelope.
  * `sbt "Test/runMain graft.Q480Time [sfDir]"` — prints warm seconds
  * for q480/q482/q487.
  */
object Q480Time {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder()
      .master(s"local[${sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")}]")
      .config("spark.sql.shuffle.partitions",
        sys.env.getOrElse("SPARK_GRAFT_CPUS", "32"))
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val dir = if (args.nonEmpty) args(0) else "/root/testdata/sf0.1"
    for (name <- Seq("q480_html_extract", "q482_crawl_pipeline",
        "q487_pipeline_v8", "q481_warc_roundtrip", "q483_warc_stream_ingest")) {
      var best = Double.MaxValue
      for (_ <- 1 to 3) {
        val t0 = System.nanoTime()
        // the Bench action: noop write evaluates EVERY column (a count
        // would let Catalyst prune the extraction projection away)
        SparkEntry.queries(name)(spark, dir)
          .write.mode("overwrite").format("noop").save()
        val s = (System.nanoTime() - t0) / 1e9
        if (s < best) best = s
      }
      println(f"Q480TIME $name min-of-3 $best%.2f s")
    }
    spark.stop()
  }
}
