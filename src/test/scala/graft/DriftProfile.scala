package graft

import java.util.concurrent.atomic.LongAdder

import org.apache.spark.scheduler.{SparkListener, SparkListenerJobStart, SparkListenerStageCompleted, SparkListenerTaskEnd}
import org.apache.spark.sql.SparkSession

/** Bench slow-tail drift profiler (VERDICT r17 #3): the r17 bench drifted
  * +15-40% vs r16 on a cluster of iterative/many-job queries (q417 q427
  * q450 q456 q465 q467) while plans were unchanged. This drive re-times
  * the cluster plus two single-job control queries under the exact Bench
  * session config, min-of-3 round-robin, and decomposes each query into
  * jobs / stages / Σtask-time — so "per-job scheduler+JVM overhead grew"
  * (wall−Σtask/cpus scales with job count, controls unaffected) versus
  * "the work itself grew" (Σtask-time up) versus "box noise" (today's
  * numbers back at r16 levels) are distinguishable from one run.
  *
  * Usage: sbt "Test/runMain graft.DriftProfile [sfDir]"
  */
object DriftProfile {
  def main(args: Array[String]): Unit = {
    val sfDir = if (args.length > 0) args(0) else "/root/testdata/sf0.1"
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
    val jobs = new LongAdder; val stages = new LongAdder
    val taskMs = new LongAdder; val tasks = new LongAdder
    spark.sparkContext.addSparkListener(new SparkListener {
      override def onJobStart(e: SparkListenerJobStart): Unit = jobs.add(1)
      override def onStageCompleted(e: SparkListenerStageCompleted): Unit =
        stages.add(1)
      override def onTaskEnd(e: SparkListenerTaskEnd): Unit = {
        tasks.add(1)
        if (e.taskInfo != null) taskMs.add(e.taskInfo.duration)
      }
    })
    // drift cluster + two controls that did NOT drift (q25 0.111->0.117,
    // q director-join class); controls separate box-wide slowdown from
    // per-job overhead growth
    val names = Seq(
      "q417_naive_bayes_langid", "q427_hll_rolling", "q450_pipeline_v7",
      "q456_kcore", "q465_incremental_components",
      "q467_labelprop_convergence",
      "q25_sim_topk", "q01_pricing_summary")
    def run(n: String): Unit =
      SparkEntry.queries(n)(spark, sfDir)
        .write.mode("overwrite").format("noop").save()
    names.foreach(run) // warm pass, uncounted
    val acc = scala.collection.mutable.Map[String,
      Vector[(Double, Long, Long, Long, Long)]]().withDefaultValue(Vector())
    for (_ <- 1 to 3; n <- names) {
      jobs.reset(); stages.reset(); taskMs.reset(); tasks.reset()
      val t0 = System.nanoTime()
      run(n)
      val wall = (System.nanoTime() - t0) / 1e9
      acc(n) = acc(n) :+ ((wall, jobs.sum, stages.sum, taskMs.sum, tasks.sum))
    }
    for (n <- names) {
      val best = acc(n).minBy(_._1)
      val (wall, j, st, tm, tk) = best
      val para = tm / 1000.0 / cpus.toInt
      println(f"""DRIFT {"name":"$n","wall":$wall%.3f,"jobs":$j%d,"stages":$st%d,"tasks":$tk%d,"task_sec":${tm / 1000.0}%.2f,"task_par_sec":$para%.3f,"overhead_sec":${wall - para}%.3f,"samples":[${acc(n).map(s => f"${s._1}%.3f").mkString(",")}]}""")
    }
    spark.stop()
  }
}
