package graft

import org.apache.spark.scheduler.{SparkListener, SparkListenerTaskEnd}
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import java.util.concurrent.atomic.LongAdder

/** One-off sf1 stress drive: replicate the sf0.1 tables `factor`x into
  * `dst` (key columns shifted per copy so ids stay unique; document text
  * gets a per-copy suffix token so the dedup workloads see realistic
  * NEAR-duplicate groups instead of pure 10x exact clones), then run the
  * heaviest register queries once warm + once measured, reporting wall
  * time plus per-query disk spill and shuffle-write volume from task
  * metrics — the footprint-cliff signals sf0.1 is too small to surface.
  *
  * Usage: SPARK_DRIVER_MEM=64g sbt "Test/runMain graft.Stress
  *          [srcDir] [dstDir] [factor] [query...]"
  * Results are recorded in DESIGN.md (round 11).
  */
object Stress {
  private val Off = 10000000L

  def main(args: Array[String]): Unit = {
    val src = if (args.length > 0) args(0) else "/root/testdata/sf0.1"
    val dst = if (args.length > 1) args(1) else "/tmp/sf1"
    val factor = if (args.length > 2) args(2).toInt else 10
    val names = if (args.length > 3) args.drop(3).toSeq else Seq(
      "q133_pipeline_v3", "q143_pipeline_v4", "q109_dup_span_removal",
      "q101_semantic_dedup", "q132_semdedup_clustered", "q71_dup_clusters",
      "q113_pagerank_trade", "q22_dedup_shingle", "x_bpe_train30",
      "q139_bloom_gated_dedup")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.autoBroadcastJoinThreshold", "64m")
      .config("spark.sql.codegen.cache.maxEntries", "2000")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    val ready = new java.io.File(s"$dst/_STRESS_READY")
    if (!ready.exists()) { generate(spark, src, dst, factor); ready.createNewFile() }

    val spill = new LongAdder; val shuf = new LongAdder
    spark.sparkContext.addSparkListener(new SparkListener {
      override def onTaskEnd(e: SparkListenerTaskEnd): Unit = {
        val m = e.taskMetrics
        if (m != null) {
          spill.add(m.diskBytesSpilled + m.memoryBytesSpilled)
          shuf.add(m.shuffleWriteMetrics.bytesWritten)
        }
      }
    })
    val extras = SparkEntry.benchExtras
    def run(n: String): Unit = extras.get(n) match {
      case Some(f) => f(spark, dst)
      case None => SparkEntry.queries(n)(spark, dst)
        .write.mode("overwrite").format("noop").save()
    }
    names.foreach { n =>
      spill.reset(); shuf.reset()
      val t0 = System.nanoTime()
      run(n)
      val t1 = (System.nanoTime() - t0) / 1e9
      val (sp1, sw1) = (spill.sum, shuf.sum)
      spill.reset(); shuf.reset()
      val t0b = System.nanoTime()
      run(n)
      val t2 = (System.nanoTime() - t0b) / 1e9
      println(f"""STRESS {"name":"$n","t_cold":$t1%.2f,"t_warm":$t2%.2f,"spill_mb":${sp1 / 1048576}%d,"shuffle_mb":${sw1 / 1048576}%d}""")
    }
    spark.stop()
  }

  private def generate(spark: SparkSession, src: String, dst: String,
      factor: Int): Unit = {
    // events carries TIMESTAMP(NANOS) parquet (see Tables.events): read it
    // as long nanos; the copy writes plain INT64, which reads back as the
    // same long — downstream queries are unaffected.
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    val copies = explode(sequence(lit(0), lit(factor - 1))).as("__c")
    def rep(tb: String) =
      spark.read.parquet(s"$src/$tb.parquet").select(col("*"), copies)
    rep("documents")
      .withColumn("doc_id", col("doc_id") + col("__c") * Off)
      .withColumn("text", when(col("__c") === 0, col("text"))
        .otherwise(concat(col("text"), lit(" v"), col("__c"))))
      .withColumn("n_chars", when(col("__c") === 0, col("n_chars"))
        .otherwise(length(col("text")).cast("long")))
      .drop("__c")
      .write.mode("overwrite").parquet(s"$dst/documents.parquet")
    rep("embeddings")
      .withColumn("vec_id", col("vec_id") + col("__c") * Off)
      .drop("__c")
      .write.mode("overwrite").parquet(s"$dst/embeddings.parquet")
    rep("lineitem")
      .withColumn("l_orderkey", col("l_orderkey") + col("__c") * Off)
      .drop("__c")
      .write.mode("overwrite").parquet(s"$dst/lineitem.parquet")
    rep("orders")
      .withColumn("o_orderkey", col("o_orderkey") + col("__c") * Off)
      .drop("__c")
      .write.mode("overwrite").parquet(s"$dst/orders.parquet")
    Seq("region", "nation", "customer", "supplier", "part", "events")
      .foreach { tb =>
        spark.read.parquet(s"$src/$tb.parquet")
          .write.mode("overwrite").parquet(s"$dst/$tb.parquet")
      }
  }
}
