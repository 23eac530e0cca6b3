package graft

import graft.operators.Dedup
import org.apache.spark.scheduler.{SparkListener, SparkListenerStageCompleted}
import scala.collection.mutable

/** Per-stage executor-time breakdown of the full q22 job (one-off
  * diagnosis). */
object Q22Stages {
  def main(args: Array[String]): Unit = {
    val spark = TestSpark.spark
    val stages = mutable.ArrayBuffer[(Int, String, Long, Long, Long)]()
    spark.sparkContext.addSparkListener(new SparkListener {
      override def onStageCompleted(sc: SparkListenerStageCompleted): Unit = {
        val si = sc.stageInfo
        stages += ((si.stageId, si.name.takeWhile(_ != '\n').take(60),
          si.taskMetrics.executorRunTime,
          si.taskMetrics.shuffleWriteMetrics.bytesWritten,
          si.taskMetrics.shuffleReadMetrics.totalBytesRead))
      }
    })
    val docs = spark.read.parquet("/root/testdata/sf0.1/documents.parquet")
      .select("doc_id", "text")
    // warmup
    Dedup.shingleJaccardPairs(docs, 0.5).write.mode("overwrite").format("noop").save()
    stages.clear()
    val t0 = System.nanoTime()
    Dedup.shingleJaccardPairs(docs, 0.5).write.mode("overwrite").format("noop").save()
    println(f"== wall: ${(System.nanoTime() - t0) / 1e9}%.2f s, stages: ${stages.size}")
    stages.sortBy(-_._3).foreach { case (id, name, ms, sw, sr) =>
      println(f"== stage $id%4d exec=${ms / 1000.0}%7.2fs swrite=${sw / 1e6}%8.1fMB sread=${sr / 1e6}%8.1fMB  $name")
    }
    spark.stop()
  }
}
