package graft

/** BPE training cost at sf0.1 (`sbt "Test/runMain graft.BpeScaleBench"`):
  * the per-merge cost after the one corpus pass is vocab-table-sized, so
  * wall time should grow linearly in merges, not corpus size. */
object BpeScaleBench {
  def main(args: Array[String]): Unit = {
    val spark = TestSpark.spark
    val docs = spark.read.parquet("/root/testdata/sf0.1/documents.parquet")
    for (m <- Seq(1, 10, 30)) {
      val t0 = System.nanoTime()
      val merges = graft.operators.Bpe.train(docs, m)
      println(f"merges=$m%-3d learned=${merges.length}%-3d ${(System.nanoTime() - t0) / 1e9}%.2f s")
    }
    val merges = graft.operators.Bpe.train(docs, 30)
    val t0 = System.nanoTime()
    val n = graft.operators.Bpe.tokenCounts(docs, merges).count()
    println(f"segment+count sf0.1 ($n docs): ${(System.nanoTime() - t0) / 1e9}%.2f s")
    spark.stop()
  }
}
