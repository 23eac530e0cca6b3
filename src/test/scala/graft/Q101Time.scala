package graft

import org.apache.spark.sql.SparkSession

/** Timing drive for semanticDedup / nearDupPairs candidate strategies and
  * LSH parameter choices: `sbt "Test/runMain graft.Q101Time [sfDir]"`.
  * With a dir argument it runs the STAGE DECOMPOSITION (pairs-only vs
  * full dedup, at the corpus-scaled plane count) used to attribute the
  * r13 sf1 residual cost; with no argument, the historical sf0.1
  * parameter sweep. */
object Q101Time {
  def main(args: Array[String]): Unit = {
    val spark =
      if (args.nonEmpty) SparkSession.builder()
        .master(s"local[${sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")}]")
        .config("spark.sql.shuffle.partitions",
          sys.env.getOrElse("SPARK_GRAFT_CPUS", "32"))
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.ui.enabled", "false")
        .getOrCreate()
      else TestSpark.spark
    spark.sparkContext.setLogLevel("WARN")
    val dir = if (args.nonEmpty) args(0) else "/root/testdata/sf0.1"
    val emb = spark.read.parquet(s"$dir/embeddings.parquet")
    if (args.nonEmpty) {
      val p = graft.operators.Similarity.scaledPlanes(emb)
      def time(label: String)(f: => Long): Unit = for (i <- 1 to 2) {
        val t0 = System.nanoTime()
        val n = f
        println(f"Q101T $label run $i: ${(System.nanoTime() - t0) / 1e9}%.2f s ($n rows)")
      }
      time(s"pairs planes=$p")(graft.operators.Similarity
        .nearDupPairs(emb, 0.8, planes = p).count())
      time(s"dedup planes=$p")(graft.operators.Similarity
        .semanticDedup(emb, 0.8, planes = p).count())
    } else {
      for ((t, p) <- Seq((16, 4), (28, 6), (48, 8), (80, 10)); i <- 1 to 3) {
        val t0 = System.nanoTime()
        val n = graft.operators.Similarity
          .nearDupPairs(emb, 0.8, tables = t, planes = p).count()
        println(f"tables=$t planes=$p run $i: ${(System.nanoTime() - t0) / 1e9}%.3f s ($n pairs)")
      }
    }
    spark.stop()
  }
}
