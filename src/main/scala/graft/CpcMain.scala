package graft

import graft.operators.CpcPipeline
import graft.sources.Acquisition
import org.apache.spark.sql.SparkSession

/** CLI entry point — E1/E2 parity (reference: main.py:23-129,
  * cli/commands.py:32-58): resolve latest version, land bulk files, parse,
  * validate, gate, publish. The `--force` flag re-downloads (working, unlike
  * the reference's TypeError path — SURVEY §3 E2).
  *
  * Usage: graft.CpcMain <dataDir> <outDir> [--version V] [--force]
  *   (offline default: uses already-landed zips in <dataDir>; live
  *   acquisition requires wiring a real PageFetcher — see
  *   graft.sources.Acquisition.)
  */
object CpcMain {
  /** Gate contract (BASELINE.md): every main defaults to local[32],
    * overridable via SPARK_MASTER / SPARK_GRAFT_CPUS. */
  def defaultMaster: String =
    sys.env.getOrElse("SPARK_MASTER",
      s"local[${sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")}]")

  def main(args: Array[String]): Unit = {
    require(args.length >= 2, "usage: CpcMain <dataDir> <outDir> [--version V] [--force]")
    val dataDir = args(0); val outDir = args(1)
    val version = args.sliding(2).collectFirst { case Array("--version", v) => v }
      .getOrElse {
        // latest landed version, reference semantics (downloader.py:63-99)
        val re = """(\d{6})""".r
        val dir = new java.io.File(dataDir)
        val vs = Option(dir.list()).getOrElse(Array.empty[String])
          .filter(_.endsWith(".zip")).flatMap(re.findFirstIn(_))
        require(vs.nonEmpty, s"no versioned zips in $dataDir")
        vs.max
      }
    val spark = SparkSession.builder()
      .master(defaultMaster)
      .appName("cpc-etl")
      .config("spark.sql.shuffle.partitions",
        sys.env.getOrElse("SPARK_GRAFT_CPUS", "32"))
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    try {
      val rep = CpcPipeline.run(spark,
        s"${dataDir.stripSuffix("/")}/CPCTitleList$version.zip",
        dataDir, version, outDir)
      if (rep.invalid > 0) {
        System.err.println(
          s"Found ${rep.invalid} invalid symbols out of ${rep.total} total symbols:")
        rep.firstInvalid.foreach { case (sym, warns) =>
          System.err.println(s"Symbol: $sym, Warnings: ${warns.mkString("; ")}")
        }
        sys.exit(1) // raise-on-failure semantics (etl_function.py:36-38)
      } else {
        println(s"All ${rep.total} symbols are valid! Published to $outDir")
      }
    } finally spark.stop()
  }
}
