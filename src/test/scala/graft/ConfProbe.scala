package graft
import org.apache.spark.sql.SparkSession

/** A/B a session-conf variant against the bench conf over a query list:
  * `Test/runMain graft.ConfProbe key=value[,key=value...] q1 q2 ...`
  * builds ONE session with the bench conf plus the overrides and runs the
  * QTime methodology (warmup + min of 3 noop-sink runs). Compare against
  * a plain QTime run of the same list. */
object ConfProbe {
  def main(args: Array[String]): Unit = {
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val d = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val overrides = args.head.split(",").map { kv =>
      val Array(k, v) = kv.split("=", 2); (k, v)
    }
    val b = SparkSession.builder().master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.autoBroadcastJoinThreshold", "64m")
      .config("spark.sql.codegen.cache.maxEntries", "2000")
      .config("spark.ui.enabled", "false")
    overrides.foreach { case (k, v) => b.config(k, v) }
    val spark = b.getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    args.tail.foreach { n =>
      def run(): Unit = SparkEntry.benchExtras.get(n) match {
        case Some(x) => x(spark, d)
        case None => SparkEntry.queries(n)(spark, d)
          .write.mode("overwrite").format("noop").save()
      }
      run()
      val ts = (1 to 3).map { _ =>
        val t0 = System.nanoTime(); run(); (System.nanoTime() - t0) / 1e9
      }
      println(f"CONFPROBE $n%-32s min=${ts.min}%7.3f s  " +
        f"runs=${ts.map(t => f"$t%.3f").mkString("[", ",", "]")}")
    }
    spark.stop()
  }
}
