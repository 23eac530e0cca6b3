package graft

import java.util.concurrent.atomic.LongAdder

import org.apache.spark.scheduler.{SparkListener, SparkListenerJobStart, SparkListenerTaskEnd}
import org.apache.spark.sql.SparkSession

/** Window-depth cost curve for the distributed suffix array (VERDICT r17
  * #4): q474/q476 register the truncated SA at depth 8; production
  * ExactSubstr dedup per Lee et al. 2022 §4.1 wants >= 50-token matches,
  * i.e. depth 64 under the power-of-two prefix-doubling contract. This
  * drive measures exactSubstrDedup at a sweep of depths on the sf1
  * replica corpus, reporting wall time, spill, shuffle volume, and job
  * count per depth — the inputs of the cost model recorded in DESIGN.md.
  *
  * Usage: SPARK_DRIVER_MEM=64g sbt "Test/runMain graft.SuffixDepthStress
  *          [dir] [depth...]"   (default /tmp/sf1, depths 8 16 32 64;
  *          generate /tmp/sf1 with graft.Stress first)
  */
object SuffixDepthStress {
  def main(args: Array[String]): Unit = {
    val dir = if (args.length > 0) args(0) else "/tmp/sf1"
    val depths = if (args.length > 1) args.drop(1).map(_.toInt).toSeq
      else Seq(8, 16, 32, 64)
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
    val spill = new LongAdder; val shuf = new LongAdder
    val jobs = new LongAdder
    spark.sparkContext.addSparkListener(new SparkListener {
      override def onTaskEnd(e: SparkListenerTaskEnd): Unit = {
        val m = e.taskMetrics
        if (m != null) {
          spill.add(m.diskBytesSpilled + m.memoryBytesSpilled)
          shuf.add(m.shuffleWriteMetrics.bytesWritten)
        }
      }
      override def onJobStart(e: SparkListenerJobStart): Unit = jobs.add(1)
    })
    val docs = spark.read.parquet(s"$dir/documents.parquet")
    def run(depth: Int): Unit =
      graft.operators.SuffixArray.exactSubstrDedup(docs, depth = depth)
        .write.mode("overwrite").format("noop").save()
    run(depths.head) // warm JIT/codegen/FS once, not counted
    // round-robin over the depth sweep (the Bench sampling lesson): a
    // machine-load transient then lands on one SAMPLE of many depths
    // instead of poisoning one depth's only measurement — min absorbs it
    val acc = scala.collection.mutable.Map[Int, Vector[(Double, Long, Long, Long)]]()
      .withDefaultValue(Vector())
    for (_ <- 1 to 2; d <- depths) {
      spill.reset(); shuf.reset(); jobs.reset()
      val t0 = System.nanoTime()
      run(d)
      val t = (System.nanoTime() - t0) / 1e9
      acc(d) = acc(d) :+ ((t, spill.sum, shuf.sum, jobs.sum))
    }
    for (d <- depths) {
      val best = acc(d).minBy(_._1)
      println(f"""SADEPTH {"depth":$d,"t_warm":${best._1}%.2f,"spill_mb":${best._2 / 1048576}%d,"shuffle_mb":${best._3 / 1048576}%d,"jobs":${best._4}%d,"samples":[${acc(d).map(s => f"${s._1}%.2f").mkString(",")}]}""")
    }
    spark.stop()
  }
}
