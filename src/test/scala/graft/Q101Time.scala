package graft

/** Timing drive for semanticDedup / nearDupPairs candidate strategies and
  * LSH parameter choices at sf0.1 (`sbt "Test/runMain graft.Q101Time"`). */
object Q101Time {
  def main(args: Array[String]): Unit = {
    val spark = TestSpark.spark
    val emb = spark.read.parquet("/root/testdata/sf0.1/embeddings.parquet")
    for ((t, p) <- Seq((16, 4), (28, 6), (48, 8), (80, 10))) {
      for (i <- 1 to 3) {
        val t0 = System.nanoTime()
        val n = graft.operators.Similarity
          .nearDupPairs(emb, 0.8, tables = t, planes = p).count()
        println(f"tables=$t planes=$p run $i: ${(System.nanoTime() - t0) / 1e9}%.3f s ($n pairs)")
      }
    }
    spark.stop()
  }
}
