package graft

import org.apache.spark.scheduler.{SparkListener, SparkListenerJobStart, SparkListenerStageSubmitted, SparkListenerTaskEnd}
import org.apache.spark.sql.SparkSession

/** Round-21 optimization measurement drive: times named queries under the
  * EXACT bench session shape (local[$SPARK_GRAFT_CPUS], shuffle.partitions
  * = cpus, 64m broadcast, big codegen cache) with one warmup pass + 3
  * timed noop-sink runs per query, and reports per-query min seconds plus
  * the JOB / STAGE / TASK counts of one measured run — the structural
  * evidence for loop-operator optimizations that never show in a final
  * `explain` (driver-side iteration is invisible to the last plan).
  *
  * `sbt "Test/runMain graft.QTime q71_dup_clusters q456_kcore"`
  * `sbt "Test/runMain graft.QTime --plan q71_dup_clusters"` also writes
  * plans/r21/q71_dup_clusters_<tag>.txt (tag from SPARK_GRAFT_PLAN_TAG,
  * default "plan") with the formatted plan of the query expression.
  */
object QTime {
  def main(args: Array[String]): Unit = {
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val d = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .appName("graft-qtime")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.autoBroadcastJoinThreshold", "64m")
      .config("spark.sql.codegen.cache.maxEntries", "2000")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val jobs = new java.util.concurrent.atomic.AtomicLong
    val stages = new java.util.concurrent.atomic.AtomicLong
    val tasks = new java.util.concurrent.atomic.AtomicLong
    spark.sparkContext.addSparkListener(new SparkListener {
      override def onJobStart(j: SparkListenerJobStart): Unit = { jobs.incrementAndGet(); () }
      override def onStageSubmitted(s: SparkListenerStageSubmitted): Unit = { stages.incrementAndGet(); () }
      override def onTaskEnd(t: SparkListenerTaskEnd): Unit = { tasks.incrementAndGet(); () }
    })
    val plan = args.contains("--plan")
    val names = args.toSeq.filterNot(_.startsWith("--"))
    val tag = sys.env.getOrElse("SPARK_GRAFT_PLAN_TAG", "plan")
    names.foreach { n =>
      val extra = SparkEntry.benchExtras.get(n)
      def run(): Unit = extra match {
        case Some(x) => x(spark, d)
        case None => SparkEntry.queries(n)(spark, d)
          .write.mode("overwrite").format("noop").save()
      }
      spark.sparkContext.setJobDescription(s"$n warmup")
      run() // warmup: JIT + codegen + FS cache, as graft.Bench does
      val ts = (1 to 3).map { i =>
        spark.sparkContext.setJobDescription(s"$n run$i")
        // count jobs/stages/tasks of the LAST timed run (warm, settled)
        if (i == 3) { jobs.set(0); stages.set(0); tasks.set(0) }
        val t0 = System.nanoTime()
        run()
        (System.nanoTime() - t0) / 1e9
      }
      // listener events are async: give the bus a moment to drain
      Thread.sleep(300)
      println(f"QTIME $n%-34s min=${ts.min}%7.3f s  runs=[${ts.map(t => f"$t%.3f").mkString(",")}]  jobs=${jobs.get}%3d stages=${stages.get}%3d tasks=${tasks.get}%5d")
      if (plan && extra.isEmpty) {
        val dir = java.nio.file.Paths.get("plans/r21")
        java.nio.file.Files.createDirectories(dir)
        val df = SparkEntry.queries(n)(spark, d)
        val txt = df.queryExecution.explainString(
          org.apache.spark.sql.execution.FormattedMode)
        java.nio.file.Files.write(dir.resolve(s"${n}_$tag.txt"),
          txt.getBytes(java.nio.charset.StandardCharsets.UTF_8))
        println(s"QTIME wrote plans/r21/${n}_$tag.txt")
      }
    }
    spark.stop()
  }
}
