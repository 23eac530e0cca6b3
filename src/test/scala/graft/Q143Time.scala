package graft
/** Repeated-run timing drive for q143 (the bench-noise diagnosis pattern
  * of Q133Time applied to the round-10 flagship). */
object Q143Time {
  def main(args: Array[String]): Unit = {
    val spark = TestSpark.spark
    val d = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    for (i <- 1 to 4) {
      val t0 = System.nanoTime()
      SparkEntry.queries("q143_pipeline_v4")(spark, d)
        .write.mode("overwrite").format("noop").save()
      println(f"q143 run $i: ${(System.nanoTime() - t0) / 1e9}%.2f s")
    }
    spark.stop()
  }
}
