package graft

import org.apache.spark.sql.functions._

/** Manifest-table METADATA cost curve at many-file counts — the r15/r16
  * held audit: how do the sidecar read paths and the derived-compaction
  * fold scale as the live-file count grows to >= 10^4? Data volume is
  * held tiny and constant-per-file so every measured number is
  * metadata-proportional, isolating the 100-TB planning question (a
  * 100-TB table at a healthy 1 GB/file is ~10^5 files; its METADATA ops
  * must stay seconds-class even when its data ops are cluster-sized).
  *
  * Usage: Test/runMain graft.ManifestMetaBench [nFiles ...]
  * (defaults 1000 4000 16000). Results recorded in DESIGN.md §"Manifest
  * metadata cost at many-file counts".
  */
object ManifestMetaBench {
  def main(args: Array[String]): Unit = {
    val sizes = if (args.nonEmpty) args.map(_.toInt).toSeq
      else Seq(1000, 4000, 16000)
    val spark = TestSpark.spark
    import graft.sources.ManifestCommit
    def timed[T](f: => T): (T, Double) = {
      val t0 = System.nanoTime(); val r = f
      (r, (System.nanoTime() - t0) / 1e9)
    }
    sizes.foreach { n =>
      val root = java.nio.file.Files
        .createTempDirectory(s"graft-metabench-$n").resolve("t").toString
      val buckets = 16
      // n files via one row per file (maxRecordsPerFile=1): tiny constant
      // data, file count is the only variable
      val rows = spark.range(n.toLong)
        .select(col("id"),
          pmod(col("id"), lit(buckets.toLong)).cast("int").as("bucket"))
      val (_, tWrite) = timed {
        ManifestCommit.overwriteViaManifest(spark, root, Seq("bucket"),
          replaceAll = true, statCols = Seq("id"), bloomCols = Seq("id"),
          bloomBits = 1 << 17) { txn =>
          rows.repartition(col("bucket"))
            .write.option("maxRecordsPerFile", 1)
            .partitionBy("bucket").parquet(txn)
        }
      }
      val (cnt, tCount) = timed(ManifestCommit.countManifested(spark, root))
      require(cnt == n, s"count $cnt != $n")
      val (mm, tMinMax) = timed(
        ManifestCommit.minMaxManifested(spark, root, "id"))
      require(mm.isDefined)
      val ((_, scanned, total), tBloom) = timed(
        ManifestCommit.readManifestedBloomPruned(spark, root, "id",
          Seq(1L, (n / 2).toLong)))
      require(scanned < total, s"bloom must prune: $scanned/$total")
      val (_, tCompact) = timed(
        ManifestCommit.compactManifestedDerived(spark, root, Seq("bucket")))
      // after compaction the derived sidecars must still serve metadata
      val (cnt2, tCount2) = timed(ManifestCommit.countManifested(spark, root))
      require(cnt2 == n, s"derived count $cnt2 != $n")
      println(f"""{"files":$n,"write_s":$tWrite%.2f,"count_s":$tCount%.3f,""" +
        f""""minmax_s":$tMinMax%.3f,"bloom_prune_s":$tBloom%.3f,""" +
        f""""bloom_files":"$scanned/$total",""" +
        f""""compact_derived_s":$tCompact%.2f,"count_after_s":$tCount2%.3f}""")
    }
    ()
  }
}
