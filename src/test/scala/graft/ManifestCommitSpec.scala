package graft

import graft.sources.ManifestCommit
import java.nio.file.Files
import org.apache.spark.sql.functions._

class ManifestCommitSpec extends GraftSpec {
  import spark.implicits._

  private def writeBase(out: String) = {
    val base = Seq((1L, "a", 10), (2L, "b", 10), (3L, "c", 20), (4L, "d", 20))
      .toDF("k", "v", "p")
    ManifestCommit.overwriteViaManifest(spark, out, Seq("p"), replaceAll = true) {
      txn => base.write.partitionBy("p").parquet(txn)
    }
    base
  }

  private def contents(out: String) =
    ManifestCommit.readManifested(spark, out).collect()
      .map(r => (r.getLong(0), r.getString(1), r.getInt(2))).toSet

  test("overwrite + read round-trip through the manifest") {
    val out = Files.createTempDirectory("mfc1").toString + "/t"
    val base = writeBase(out)
    assert(contents(out) ==
      base.collect().map(r => (r.getLong(0), r.getString(1), r.getInt(2))).toSet)
    val snap = ManifestCommit.currentSnapshot(spark, out).get
    assert(snap.version == 1L && snap.entries.keySet == Set("p=10", "p=20"))
  }

  test("upsert touches only its partitions; untouched stay on their old txn") {
    val out = Files.createTempDirectory("mfc2").toString + "/t"
    writeBase(out)
    val txn20Before = ManifestCommit.currentSnapshot(spark, out).get.entries("p=20")
    ManifestCommit.upsertManifested(spark, out,
      Seq((1L, "A2", 10), (9L, "z", 10)).toDF("k", "v", "p"), Seq("k"), Seq("p"))
    val snap = ManifestCommit.currentSnapshot(spark, out).get
    assert(snap.version == 2L)
    assert(snap.entries("p=20") == txn20Before, "untouched partition not rewritten")
    assert(snap.entries("p=10") != txn20Before)
    assert(contents(out) == Set((1L, "A2", 10), (2L, "b", 10), (9L, "z", 10),
      (3L, "c", 20), (4L, "d", 20)))
    // replay converges
    ManifestCommit.upsertManifested(spark, out,
      Seq((1L, "A2", 10), (9L, "z", 10)).toDF("k", "v", "p"), Seq("k"), Seq("p"))
    assert(contents(out) == Set((1L, "A2", 10), (2L, "b", 10), (9L, "z", 10),
      (3L, "c", 20), (4L, "d", 20)))
  }

  test("crash before publish leaves readers untouched; vacuum collects the orphan") {
    val out = Files.createTempDirectory("mfc3").toString + "/t"
    writeBase(out)
    val want = contents(out)
    // a writer that crashed after writing its txn dir but before publishing
    Seq((1L, "GARBAGE", 10)).toDF("k", "v", "p")
      .write.partitionBy("p").parquet(s"$out/data/txn-dead-beef")
    assert(contents(out) == want, "uncommitted txn must be invisible")
    // young orphans survive (could be an in-flight writer)...
    assert(ManifestCommit.vacuum(spark, out) == 0)
    assert(new java.io.File(s"$out/data/txn-dead-beef").exists())
    // ...old ones are collected; live txns are never touched
    assert(ManifestCommit.vacuum(spark, out, minAgeMs = -10000) == 1)
    assert(!new java.io.File(s"$out/data/txn-dead-beef").exists())
    assert(contents(out) == want)
  }

  test("losing a commit race throws and leaves the old snapshot readable") {
    val out = Files.createTempDirectory("mfc4").toString + "/t"
    writeBase(out)
    val want = contents(out)
    // another writer claims version 2 WHILE our transaction is writing its
    // data (after our snapshot read, before our publish) — the losing
    // window optimistic concurrency must detect
    val stolen = new java.io.File(s"$out/_manifests/" + "0" * 19 + "2.manifest")
    val snap1 = ManifestCommit.currentSnapshot(spark, out).get
    intercept[java.nio.file.FileAlreadyExistsException] {
      ManifestCommit.overwriteViaManifest(spark, out, Seq("p")) { txn =>
        Seq((1L, "LOSER", 10)).toDF("k", "v", "p")
          .write.partitionBy("p").parquet(txn)
        Files.write(stolen.toPath, snap1.entries.toSeq.sorted
          .map { case (rel, t) => s"$t\t$rel" }.mkString("\n").getBytes("UTF-8"))
      }
    }
    assert(contents(out) == want)
    // the loser re-runs against the new snapshot and succeeds at version 3
    ManifestCommit.upsertManifested(spark, out,
      Seq((1L, "A2", 10)).toDF("k", "v", "p"), Seq("k"), Seq("p"))
    assert(ManifestCommit.currentSnapshot(spark, out).get.version == 3L)
    assert(contents(out) == (want - ((1L, "a", 10)) + ((1L, "A2", 10))))
  }

  test("compaction collapses generations to one txn; vacuum then retires the old dirs") {
    val out = Files.createTempDirectory("mfc6").toString + "/t"
    writeBase(out)
    ManifestCommit.upsertManifested(spark, out,
      Seq((1L, "A2", 10)).toDF("k", "v", "p"), Seq("k"), Seq("p"))
    val want = contents(out)
    assert(ManifestCommit.currentSnapshot(spark, out).get.entries.values.toSet.size == 2,
      "upsert leaves two live generations")
    val snap = ManifestCommit.compactManifested(spark, out, Seq("p"))
    assert(snap.entries.values.toSet.size == 1, "one generation after compaction")
    assert(contents(out) == want, "compaction preserves content")
    // old generations still on disk — retained manifests keep them live
    // (time travel), so a vacuum with full retention removes nothing
    assert(new java.io.File(s"$out/data").listFiles().count(_.getName.startsWith("txn-")) == 3)
    assert(ManifestCommit.vacuum(spark, out, minAgeMs = -10000) == 0)
    // retiring history to the newest version frees the old generations
    assert(ManifestCommit.vacuum(spark, out, minAgeMs = -10000, keepManifests = 1) == 2)
    assert(contents(out) == want)
  }

  test("time travel: every retained version readable; vacuum bounds the horizon") {
    val out = Files.createTempDirectory("mfc7").toString + "/t"
    val base = writeBase(out)
    val v1 = base.collect().map(r => (r.getLong(0), r.getString(1), r.getInt(2))).toSet
    ManifestCommit.upsertManifested(spark, out,
      Seq((1L, "A2", 10)).toDF("k", "v", "p"), Seq("k"), Seq("p"))
    val v2 = contents(out)
    assert(v2 != v1)
    def at(v: Long) = ManifestCommit.readManifested(spark, out, Some(v)).collect()
      .map(r => (r.getLong(0), r.getString(1), r.getInt(2))).toSet
    assert(at(1L) == v1, "version 1 still reads its original state")
    assert(at(2L) == v2)
    // retire version 1; its now-unreferenced generation is collectable
    ManifestCommit.vacuum(spark, out, minAgeMs = -10000, keepManifests = 1)
    intercept[java.io.FileNotFoundException] { at(1L) }
    assert(at(2L) == v2, "current version unaffected by retirement")
  }

  test("no directory is ever renamed or deleted on the commit path") {
    val out = Files.createTempDirectory("mfc5").toString + "/t"
    writeBase(out)
    val before = new java.io.File(s"$out/data").listFiles().map(_.getName).toSet
    ManifestCommit.upsertManifested(spark, out,
      Seq((1L, "A2", 10)).toDF("k", "v", "p"), Seq("k"), Seq("p"))
    val after = new java.io.File(s"$out/data").listFiles().map(_.getName).toSet
    assert(before.subsetOf(after), "old txn dirs immutable through a commit")
    assert((after -- before).size == 1, "exactly one new txn dir per commit")
  }
}
