package graft
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Phase breakdown for q465_incremental_components: the register row is
  * pairs-discovery + 3 maintenance batches + the manifest read-back, and
  * QTime only shows the total (7.3 s / 151 jobs at sf0.1). This probe
  * times each phase in the bench session shape so the optimization wave
  * targets the phase that actually pays, and counts jobs per phase. */
object Q465Probe {
  def main(args: Array[String]): Unit = {
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder().master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.autoBroadcastJoinThreshold", "64m")
      .config("spark.sql.codegen.cache.maxEntries", "2000")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val d = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val jobs = new java.util.concurrent.atomic.AtomicLong
    spark.sparkContext.addSparkListener(
      new org.apache.spark.scheduler.SparkListener {
        override def onJobStart(
            j: org.apache.spark.scheduler.SparkListenerJobStart): Unit = {
          jobs.incrementAndGet(); ()
        }
      })
    import graft.operators.{Dedup, Incremental}
    def docs = spark.read.parquet(s"$d/documents.parquet")
    def once(warm: Boolean): Unit = {
      val t0 = System.nanoTime()
      val pairs = Dedup.shingleJaccardPairs(docs, 0.5)
        .select(col("id_a"), col("id_b")).localCheckpoint()
      val j0 = jobs.get()
      val t1 = System.nanoTime()
      if (warm) println(f"PROBE pairs ${(t1 - t0) / 1e9}%.2f s  jobs=$j0")
      val n = docs.agg(max(col("doc_id"))).head.getLong(0)
      val hi = greatest(col("id_a"), col("id_b"))
      val root = java.nio.file.Files.createTempDirectory("graft-q465p")
        .resolve("cc_state").toString
      var tPrev = System.nanoTime(); var jPrev = jobs.get()
      Seq(hi <= lit(n / 3),
          hi > lit(n / 3) && hi <= lit(2 * n / 3),
          hi > lit(2 * n / 3)).zipWithIndex.foreach { case (w, i) =>
        Incremental.incrementalComponents(spark, root, pairs.where(w))
        val t = System.nanoTime(); val j = jobs.get()
        if (warm) println(
          f"PROBE batch$i ${(t - tPrev) / 1e9}%.2f s  jobs=${j - jPrev}")
        tPrev = t; jPrev = j
      }
      Incremental.readComponents(spark, root)
        .select(col("id").as("doc_id"), col("cluster"))
        .orderBy("doc_id")
        .write.mode("overwrite").format("noop").save()
      val t = System.nanoTime()
      if (warm) println(f"PROBE readback ${(t - tPrev) / 1e9}%.2f s  " +
        f"jobs=${jobs.get() - jPrev}")
      if (warm) println(f"PROBE total ${(t - t0) / 1e9}%.2f s  jobs=${jobs.get()}")
    }
    once(warm = false) // JIT + codegen warmup, uncounted
    jobs.set(0)
    once(warm = true)
    jobs.set(0)
    once(warm = true)
    spark.stop()
  }
}
