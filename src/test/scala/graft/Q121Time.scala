package graft
/** Timing drive for q121: `sbt "Test/runMain graft.Q121Time"`. */
object Q121Time {
  def main(args: Array[String]): Unit = {
    val spark = TestSpark.spark
    val d = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val fn = SparkEntry.queries("q121_pipeline_v2")
    (1 to 4).foreach { i =>
      val t0 = System.nanoTime()
      fn(spark, d).collect()
      println(f"== run $i: ${(System.nanoTime() - t0) / 1e9}%.3f s")
    }
    spark.stop()
  }
}
