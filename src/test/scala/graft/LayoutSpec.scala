package graft

import graft.operators.Layout
import org.apache.spark.sql.functions._

/** File-level evidence for the z-order layout claim: a box predicate on the
  * SECOND dimension must touch fewer z-ordered files than linearly-sorted
  * files. Envelopes are computed by reading each written file separately —
  * the same min/max a parquet-stats-driven scan prunes with. */
class LayoutSpec extends GraftSpec {
  import spark.implicits._

  private def envelopes(dir: String): Seq[(Int, Int, Int, Int)] =
    new java.io.File(dir).listFiles()
      .filter(f => f.getName.startsWith("part-") && f.getName.endsWith(".parquet"))
      .toSeq.map { f =>
        val r = spark.read.parquet(f.toString)
          .agg(min("a"), max("a"), min("b"), max("b")).collect()(0)
        (r.getInt(0), r.getInt(1), r.getInt(2), r.getInt(3))
      }

  test("z-order: 2nd-dimension box prunes files a linear sort cannot") {
    val n = 64
    val grid = (for (a <- 0 until n; b <- 0 until n) yield (a, b)).toDF("a", "b")
    val root = java.nio.file.Files.createTempDirectory("graft-layout").toString
    val zdir = s"$root/z"
    val ldir = s"$root/linear"
    Layout.zOrderedWrite(grid, "a", "b", zdir, nFiles = 16)
    grid.repartitionByRange(16, col("a"), col("b"))
      .sortWithinPartitions("a", "b")
      .write.parquet(ldir)

    // roundtrip completeness first: layout must never lose rows
    assert(spark.read.parquet(zdir).count() == n.toLong * n)

    // b in [8, 23], any a: every linear (a-striped) file contains all b, so
    // nothing prunes; z-tiles bound b, so most files' envelopes miss the box
    def hitsB(env: Seq[(Int, Int, Int, Int)]) =
      env.count { case (_, _, bMin, bMax) => bMax >= 8 && bMin <= 23 }
    val zHits = hitsB(envelopes(zdir))
    val lHits = hitsB(envelopes(ldir))
    assert(lHits == 16, s"linear layout should be unprunable on b, got $lHits/16")
    assert(zHits < lHits, s"z-order pruned nothing: $zHits vs $lHits")
    assert(zHits <= 12, s"z-order envelopes too loose: $zHits/16 files hit")
  }

  test("hilbert write: 2nd-dimension box prunes at least as well as z-order") {
    val n = 64
    val grid = (for (a <- 0 until n; b <- 0 until n) yield (a, b)).toDF("a", "b")
    val root = java.nio.file.Files.createTempDirectory("graft-layout-h").toString
    val hdir = s"$root/h"
    val zdir = s"$root/z"
    Layout.hilbertOrderedWrite(grid, "a", "b", hdir, nFiles = 16, bits = 6)
    Layout.zOrderedWrite(grid, "a", "b", zdir, nFiles = 16, bits = 6)
    assert(spark.read.parquet(hdir).count() == n.toLong * n,
      "hilbert layout must never lose rows")
    def hitsB(env: Seq[(Int, Int, Int, Int)]) =
      env.count { case (_, _, bMin, bMax) => bMax >= 8 && bMin <= 23 }
    val hHits = hitsB(envelopes(hdir))
    val zHits = hitsB(envelopes(zdir))
    assert(hHits <= zHits,
      s"hilbert envelopes should prune at least as well: $hHits vs $zHits")
    assert(hHits <= 12, s"hilbert envelopes too loose: $hHits/16 files hit")
  }
}
