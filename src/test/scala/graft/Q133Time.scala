package graft

/** Repeated-run timing drive for the round-9 bench heavyweights at sf0.1
  * (`sbt "Test/runMain graft.Q133Time"`): q133 pipeline v3 and its q129
  * k-means stage, N warm runs each. The Q101Time pattern — when a
  * driver-side BENCH sample spikes, a flat series here distinguishes a
  * machine-load transient from a real regression without a full bench. */
object Q133Time {
  def main(args: Array[String]): Unit = {
    val spark = TestSpark.spark
    val d = "/root/testdata/sf0.1"
    val runs = args.headOption.map(_.toInt).getOrElse(6)
    for (q <- Seq("q129_kmeans_embed", "q133_pipeline_v3"); i <- 1 to runs) {
      val t0 = System.nanoTime()
      val n = SparkEntry.queries(q)(spark, d).count()
      println(f"$q run $i: ${(System.nanoTime() - t0) / 1e9}%.3f s ($n rows)")
    }
    spark.stop()
  }
}
