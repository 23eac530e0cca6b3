package graft

import scala.jdk.CollectionConverters._

import org.scalatest.funsuite.AnyFunSuite

/** TRUE two-process OCC race: two separate JVMs ([[ManifestRaceWorker]])
  * race `upsertManifested` on one table over a real filesystem. The
  * in-process ManifestCommitSpec races simulate the losing window by
  * planting a stolen manifest; only separate processes exercise the
  * atomicity of the claim itself (exists/rename interleavings the JVM
  * serializes in-process). Proves: every commit from both writers lands
  * (no lost update), losers retry and succeed, and the version chain
  * advances exactly once per successful commit. */
class ManifestRaceSpec extends AnyFunSuite {
  private val spark = TestSpark.spark
  import spark.implicits._

  test("two JVMs racing upsertManifested: no lost update, losers retry") {
    val rounds = 5
    val out = java.nio.file.Files.createTempDirectory("mrace").toString + "/t"
    // base table: one row in each worker's partition
    graft.sources.ManifestCommit.overwriteViaManifest(spark, out, Seq("p")) {
      txn =>
        Seq((1L, -1L, "base1"), (2L, -2L, "base2")).toDF("p", "k", "v")
          .write.partitionBy("p").parquet(txn)
    }
    val base = graft.sources.ManifestCommit.currentSnapshot(spark, out).get.version

    val javaBin = sys.props("java.home") + "/bin/java"
    val cp = sys.props("java.class.path")
    // re-use this forked JVM's --add-opens set (build.sbt's jdk17 list)
    val opens = java.lang.management.ManagementFactory.getRuntimeMXBean
      .getInputArguments.asScala.toSeq.sliding(2)
      .collect { case Seq("--add-opens", v) => Seq("--add-opens", v) }
      .flatten.toSeq
    def launch(id: Int): (Process, java.io.File) = {
      val log = java.io.File.createTempFile(s"race-w$id-", ".log")
      val cmd = (Seq(javaBin, "-cp", cp, "-Xmx2g") ++ opens ++ Seq(
        "-Dspark.ui.enabled=false",
        "graft.ManifestRaceWorker", out, id.toString, rounds.toString,
        base.toString)).asJava
      val pb = new ProcessBuilder(cmd)
      pb.redirectErrorStream(true)
      pb.redirectOutput(log)
      (pb.start(), log)
    }
    val (p1, log1) = launch(1)
    val (p2, log2) = launch(2)
    assert(p1.waitFor(10, java.util.concurrent.TimeUnit.MINUTES) &&
      p2.waitFor(10, java.util.concurrent.TimeUnit.MINUTES),
      "race workers timed out")
    def result(log: java.io.File): (Int, Int) = {
      val lines = java.nio.file.Files.readAllLines(log.toPath).asScala
      val r = lines.reverseIterator
        .collectFirst { case l if l.startsWith("RACE_RESULT") =>
          val kv = l.split(" ").collect {
            case s if s.contains("=") =>
              val Array(a, b) = s.split("="); a -> b.toInt
          }.toMap
          (kv("retries"), kv("commits"))
        }
      assert(r.isDefined, s"no RACE_RESULT in ${log.getAbsolutePath}:\n" +
        lines.takeRight(30).mkString("\n"))
      r.get
    }
    assert(p1.exitValue() == 0, s"worker 1 failed — see $log1")
    assert(p2.exitValue() == 0, s"worker 2 failed — see $log2")
    val (ret1, com1) = result(log1)
    val (ret2, com2) = result(log2)

    // every commit landed exactly once: the version chain has one link per
    // successful upsert — a lost update would leave a gap or a short chain
    val fin = graft.sources.ManifestCommit.currentSnapshot(spark, out).get
    assert(com1 == rounds && com2 == rounds)
    assert(fin.version == base + 2L * rounds,
      s"expected ${base + 2L * rounds} versions, got ${fin.version}")
    // no lost update: both workers' every row is present with its value
    val got = graft.sources.ManifestCommit.readManifested(spark, out)
      .selectExpr("p", "k", "v").as[(Long, Long, String)].collect().toSet
    val want = Set((1L, -1L, "base1"), (2L, -2L, "base2")) ++
      (0 until rounds).flatMap(k => Seq(
        (1L, 1000L + k, s"w1-r$k"), (2L, 2000L + k, s"w2-r$k")))
    assert(got == want)
    // the race was real: at least one publish lost and re-ran
    assert(ret1 + ret2 >= 1,
      s"no OCC collision in $rounds lockstep rounds (retries $ret1+$ret2) — " +
        "the barrier protocol should overlap every round")
    log1.delete(); log2.delete()
  }
}
