package graft
object Q101Time {
  def main(args: Array[String]): Unit = {
    val spark = TestSpark.spark
    val emb = spark.read.parquet("/root/testdata/sf0.1/embeddings.parquet")
    for (i <- 1 to 3) {
      val t0 = System.nanoTime()
      graft.operators.Similarity.semanticDedup(emb, 0.8).count()
      println(f"run $i: ${(System.nanoTime() - t0) / 1e9}%.3f s")
    }
    spark.stop()
  }
}
