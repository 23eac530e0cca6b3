package graft

import graft.operators.Dedup
import org.apache.spark.sql.SparkSession

/** q22 exchange-shape profiler: PPJoin with vs without the explicit
  * did-keyed shingle exchange, under the bench session config.
  * `sbt "Test/runMain graft.Q22Profile"`. */
object Q22Profile {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.autoBroadcastJoinThreshold", "64m")
      .config("spark.sql.codegen.cache.maxEntries", "2000")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val docs = spark.read.parquet("/root/testdata/sf0.1/documents.parquet")

    def noop(df: org.apache.spark.sql.DataFrame): Unit =
      df.write.mode("overwrite").format("noop").save()
    def sorted(df: org.apache.spark.sql.DataFrame) =
      df.repartition(1).sortWithinPartitions("id_a", "id_b")
    def time(label: String)(f: => Unit): Unit = {
      val t = (1 to 3).map { _ =>
        val t0 = System.nanoTime(); f; (System.nanoTime() - t0) / 1e9
      }.min
      println(f"== $label: $t%.3f s")
    }

    def shared = sorted(Dedup.shingleJaccardPairs(docs, 0.5))
    def direct = sorted(Dedup.shingleJaccardPairs(docs, 0.5, shareShingleExchange = false))

    noop(shared); noop(direct) // warmup
    time("q22 shared did-exchange (current)")(noop(shared))
    time("q22 direct (no did-exchange)")(noop(direct))
    val a = shared.collect().toSeq
    val b = direct.collect().toSeq
    println(s"== results equal: ${a == b} (${a.size} pairs)")
    spark.stop()
  }
}
