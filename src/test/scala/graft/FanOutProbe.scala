package graft
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** A/B probe for scale-adaptive scan fan-out: the sf0.1 documents table
  * is one 0.6 MB parquet file = ONE scan split, so every explode-heavy
  * operator's first stage runs on one core. Times trainedLangId and
  * shingleJaccardPairs with and without a repartition(defaultParallelism)
  * on the doc side before the explode. */
object FanOutProbe {
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
    def docs = spark.read.parquet(s"$d/documents.parquet")
    val p = spark.sparkContext.defaultParallelism
    println(s"PROBE scan splits=${docs.rdd.getNumPartitions} parallelism=$p")
    def time(label: String)(f: => Unit): Unit = {
      f
      val ts = (1 to 3).map { _ =>
        val t0 = System.nanoTime(); f; (System.nanoTime() - t0) / 1e9 }
      println(f"PROBE $label ${ts.min}%.2f s  runs=${ts.map(t => f"$t%.2f").mkString(",")}")
    }
    time("langid as-is") {
      graft.operators.TrainingPrep.trainedLangId(
          docs, docs.where(col("doc_id") % 10 === 0), n = 3, vocabSize = 500)
        .orderBy("doc_id").write.mode("overwrite").format("noop").save()
    }
    time("langid fanout") {
      val dd = docs.repartition(p)
      graft.operators.TrainingPrep.trainedLangId(
          dd, dd.where(col("doc_id") % 10 === 0), n = 3, vocabSize = 500)
        .orderBy("doc_id").write.mode("overwrite").format("noop").save()
    }
    time("pairs as-is") {
      graft.operators.Dedup.shingleJaccardPairs(docs, 0.5)
        .select(col("id_a"), col("id_b"))
        .write.mode("overwrite").format("noop").save()
    }
    time("pairs fanout") {
      graft.operators.Dedup.shingleJaccardPairs(docs.repartition(p), 0.5)
        .select(col("id_a"), col("id_b"))
        .write.mode("overwrite").format("noop").save()
    }
    time("suffixdupes as-is") {
      graft.operators.SuffixArray.duplicateWindows(docs, depth = 8)
        .orderBy(col("cnt").desc, col("gram")).limit(20)
        .write.mode("overwrite").format("noop").save()
    }
    time("suffixdupes fanout") {
      graft.operators.SuffixArray.duplicateWindows(docs.repartition(p), depth = 8)
        .orderBy(col("cnt").desc, col("gram")).limit(20)
        .write.mode("overwrite").format("noop").save()
    }
    spark.stop()
  }
}
