package graft

import graft.operators.Dedup
import org.apache.spark.sql.functions._

/** Scratch profiler for the dedup hot path: `sbt "Test/runMain graft.ProfileDrive"`. */
object ProfileDrive {
  def main(args: Array[String]): Unit = {
    val spark = TestSpark.spark
    import spark.implicits._
    val docs = spark.read.parquet("/root/testdata/sf0.1/documents.parquet")
    def time[T](label: String)(f: => T): T = {
      val t0 = System.nanoTime(); val r = f
      println(f"== $label: ${(System.nanoTime() - t0) / 1e9}%.2f s"); r
    }
    docs.count()
    val ex = docs.select(col("doc_id").cast("long").as("did"),
      graft.expressions.ShingleHashes.shingle_hashes(col("text"), 3).as("shs"))
      .select(col("did"), size(col("shs")).as("nsh"), explode(col("shs")).as("sh"))
    time("exploded-hashed count")(println(ex.count()))
    val prefix = Dedup.prefixShingles(docs, 0.5, "doc_id", "text", 3)
    val minOverlap = ceil(lit(0.5 / 1.5) * (col("a.nsh") + col("b.nsh")))
    val overlapBound = least(col("a.rk"), col("b.rk")) - 1 +
      least(col("a.nsh") - col("a.rk"), col("b.nsh") - col("b.rk")) + 1
    time("full q22 (a)")(Dedup.shingleJaccardPairs(docs, 0.5).write.mode("overwrite").format("noop").save())
    time("full q22 (b)")(Dedup.shingleJaccardPairs(docs, 0.5).write.mode("overwrite").format("noop").save())
    time("full q22 (c)")(Dedup.shingleJaccardPairs(docs, 0.5).write.mode("overwrite").format("noop").save())
    for (n <- Seq("q01_pricing_summary","q02_filter_project","q03_segment_topn","q04_semijoin_exists","q05_nation_revenue","q14_time_bucket","q18_sessionize","q20_dedup_exact","q23_dedup_minhash","q25_sim_topk","q19_asof_join","q54_sql_revenue"))
      SparkEntry.queries(n)(spark, "/root/testdata/sf0.1").write.mode("overwrite").format("noop").save()
    time("q22 with orderBy (a)")(Dedup.shingleJaccardPairs(docs, 0.5).orderBy("id_a", "id_b").write.mode("overwrite").format("noop").save())
    time("q22 with orderBy (b)")(Dedup.shingleJaccardPairs(docs, 0.5).orderBy("id_a", "id_b").write.mode("overwrite").format("noop").save())
    time("q22 sortWithinPartitions(1)")(Dedup.shingleJaccardPairs(docs, 0.5).repartition(1).sortWithinPartitions("id_a", "id_b").write.mode("overwrite").format("noop").save())
    spark.stop()
  }
}
