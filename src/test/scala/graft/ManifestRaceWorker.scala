package graft

import org.apache.spark.sql.SparkSession

/** One competitor in the cross-process OCC race ([[ManifestRaceSpec]]):
  * its OWN JVM and SparkSession, so the optimistic-concurrency claim is
  * exercised across real processes on a real filesystem — the in-process
  * ManifestCommitSpec race can only simulate the losing window.
  *
  * Protocol: args = (tablePath, workerId, rounds, baseVersion). Round k
  * spin-waits until the table reaches version base + 2k (BOTH workers'
  * round-(k-1) commits landed — keeps the processes in lockstep so their
  * round-k merges overlap), then upserts its row for round k, retrying on
  * [[java.nio.file.FileAlreadyExistsException]] (the documented loser
  * contract) until it commits. Prints one RACE_RESULT line. */
object ManifestRaceWorker {
  def main(args: Array[String]): Unit = {
    val path = args(0)
    val id = args(1).toInt
    val rounds = args(2).toInt
    val base = args(3).toLong
    val spark = SparkSession.builder()
      .master("local[2]")
      .appName(s"manifest-race-$id")
      .config("spark.sql.shuffle.partitions", "2")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    import spark.implicits._
    var retries = 0
    var commits = 0
    for (k <- 0 until rounds) {
      val gate = base + 2L * k
      while (graft.sources.ManifestCommit.currentSnapshot(spark, path)
          .exists(_.version < gate)) Thread.sleep(2)
      val updates = Seq((id.toLong, id.toLong * 1000 + k, s"w$id-r$k"))
        .toDF("p", "k", "v")
      var done = false
      while (!done) {
        try {
          graft.sources.ManifestCommit.upsertManifested(
            spark, path, updates, Seq("k"), Seq("p"))
          commits += 1
          done = true
        } catch {
          case _: java.nio.file.FileAlreadyExistsException => retries += 1
        }
      }
    }
    println(s"RACE_RESULT worker=$id retries=$retries commits=$commits")
    spark.stop()
    sys.exit(0)
  }
}
