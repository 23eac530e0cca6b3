package graft

import java.nio.file.Files

/** Drives the CLI entry end-to-end on fixture zips:
  * `sbt "Test/runMain graft.CpcMainDrive"`. */
object CpcMainDrive {
  def main(args: Array[String]): Unit = {
    if (!sys.env.contains("SPARK_MASTER") && !sys.env.contains("SPARK_GRAFT_CPUS"))
      assert(CpcMain.defaultMaster == "local[32]",
        s"gate contract: CpcMain must default to local[32], got ${CpcMain.defaultMaster}")
    val dir = CpcFixtures.dataDir()
    val out = Files.createTempDirectory("cpc-cli-out")
    CpcMain.main(Array(dir.toString, out.toString))
    println("== CpcMainDrive: published=" +
      Files.exists(out.resolve(s"cpc_schema_${CpcFixtures.Version}.parquet")))
  }
}
