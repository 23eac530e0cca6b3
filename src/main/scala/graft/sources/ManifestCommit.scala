package graft.sources

import org.apache.hadoop.fs.{FileSystem, Path}
import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Manifest-committed partitioned table: the object-store-safe durability
  * story [[TableWriters.overwriteViaStaging]] explicitly defers
  * (rename-aside needs atomic DIRECTORY rename, which HDFS/POSIX have and
  * S3-style stores do not).
  *
  * Layout (the public Delta/Iceberg log model, reduced to its commit core):
  * {{{
  *   path/data/txn-<uuid>/<partition dirs>/part-N.parquet  immutable, write-once
  *   path/_manifests/<20-digit-version>.manifest       one line per live
  *                                                     partition: "txn\trel"
  * }}}
  * Data files are NEVER renamed, moved, or overwritten — a transaction
  * writes a fresh `txn-` directory nobody references yet, then commits by
  * publishing manifest version V+1 whose entries point touched partitions
  * at the new txn and keep untouched partitions on their old txns. Readers
  * resolve the highest manifest version and read exactly the directories it
  * lists.
  *
  * WHY THIS IS CRASH- AND OBJECT-STORE-SAFE:
  *  - a crash anywhere before the manifest publish leaves only an
  *    unreferenced txn dir — readers are untouched; [[vacuum]] collects it
  *    once it is old enough;
  *  - the publish itself is a single FILE created at a name that must not
  *    already exist (rename-without-overwrite here; a conditional
  *    PUT/If-None-Match on real object stores) — it either fully exists or
  *    doesn't, so no torn state is observable;
  *  - two racing writers both targeting V+1: exactly one create succeeds,
  *    the loser gets [[java.nio.file.FileAlreadyExistsException]] and must
  *    re-run its whole operation against the new snapshot (optimistic
  *    concurrency, same contract as the public table formats).
  *
  * SCALE: the manifest holds one short line per PARTITION (not per file),
  * so even a 100k-partition table commits kilobytes; reads group entries
  * by txn and issue one parquet scan per txn generation, so manifest age —
  * not table size — bounds planning fan-out (compaction collapses
  * generations). Data-side cost is identical to the staged variant: only
  * touched partitions are written.
  */
object ManifestCommit {

  private val DataDir = "data"
  private val ManifestDir = "_manifests"
  private val ManifestSuffix = ".manifest"

  private def fsOf(spark: SparkSession, p: Path): FileSystem =
    p.getFileSystem(spark.sparkContext.hadoopConfiguration)

  private def manifestPath(root: Path, v: Long) =
    new Path(new Path(root, ManifestDir), f"$v%020d$ManifestSuffix")

  /** A resolved table state: manifest version + (relative partition path ->
    * txn dir name). `rel` is "" for an unpartitioned table. */
  final case class Snapshot(version: Long, entries: Map[String, String])

  /** Resolves the table state at `version` — or the newest version when
    * `version` is None. Every retained manifest version stays readable
    * (TIME TRAVEL): a version file is immutable once published and the
    * txn dirs it references survive until [[vacuum]] retires versions
    * beyond the retention window. */
  def snapshotAt(spark: SparkSession, path: String,
      version: Option[Long] = None): Option[Snapshot] = {
    val root = new Path(path)
    val fs = fsOf(spark, root)
    val mdir = new Path(root, ManifestDir)
    if (!fs.exists(mdir)) None
    else {
      val versions = fs.listStatus(mdir).map(_.getPath.getName)
        .filter(n => n.endsWith(ManifestSuffix) && !n.startsWith("."))
        .map(n => n.stripSuffix(ManifestSuffix).toLong)
      val chosen = version match {
        case Some(v) =>
          if (versions.contains(v)) Some(v)
          else throw new java.io.FileNotFoundException(
            s"manifest version $v not found at $path (retained: ${versions.sorted.mkString(",")})")
        case None => versions.maxOption
      }
      chosen.map { v =>
        val in = fs.open(manifestPath(root, v))
        val text = try scala.io.Source.fromInputStream(in, "UTF-8").mkString
          finally in.close()
        val entries = text.split('\n').filter(_.nonEmpty).map { line =>
          val i = line.indexOf('\t')
          line.substring(i + 1) -> line.substring(0, i)
        }.toMap
        Snapshot(v, entries)
      }
    }
  }

  def currentSnapshot(spark: SparkSession, path: String): Option[Snapshot] =
    snapshotAt(spark, path, None)

  /** Reads the table at its current manifest version — or, with
    * `version`, at a retained historical one (time travel). One scan per
    * live txn generation (entries grouped by txn, `basePath` recovers the
    * partition columns), unioned by name. */
  def readManifested(spark: SparkSession, path: String,
      version: Option[Long] = None): DataFrame = {
    val snap = snapshotAt(spark, path, version).getOrElse(
      throw new java.io.FileNotFoundException(s"no manifest at $path"))
    snap.entries.groupBy(_._2).map { case (txn, es) =>
      val base = s"$path/$DataDir/$txn"
      val dirs = es.keys.map(rel => if (rel.isEmpty) base else s"$base/$rel").toSeq
      spark.read.option("basePath", base).parquet(dirs: _*)
    }.reduce(_.unionByName(_))
  }

  /** Writes a new txn directory via `writeTo`, then publishes the next
    * manifest version. `replaceAll=true` drops every previous entry (full
    * overwrite); otherwise old entries survive except where the new txn
    * wrote the same partition (the upsert/compaction shape).
    *
    * Throws [[java.nio.file.FileAlreadyExistsException]] when another
    * writer committed first — the caller re-runs against the new snapshot. */
  def overwriteViaManifest(spark: SparkSession, path: String,
      partitionCols: Seq[String], replaceAll: Boolean = false)(
      writeTo: String => Unit): Snapshot = {
    val root = new Path(path)
    val fs = fsOf(spark, root)
    val before = currentSnapshot(spark, path)
    val txn = s"txn-${java.util.UUID.randomUUID()}"
    val txnDir = new Path(new Path(root, DataDir), txn)
    writeTo(txnDir.toString)
    def leaves(p: Path, depth: Int, rel: String): Seq[String] =
      if (depth == 0) Seq(rel)
      else fs.listStatus(p).toSeq.filter(_.isDirectory).map(_.getPath)
        .filter(_.getName.contains("="))
        .flatMap(c => leaves(c, depth - 1,
          if (rel.isEmpty) c.getName else s"$rel/${c.getName}"))
    val touched = leaves(txnDir, partitionCols.length, "").map(_ -> txn).toMap
    val baseEntries = if (replaceAll) Map.empty[String, String]
      else before.map(_.entries).getOrElse(Map.empty)
    val next = Snapshot(before.map(_.version).getOrElse(0L) + 1L,
      baseEntries ++ touched)
    // publish: full content to a hidden tmp file, then rename WITHOUT
    // overwrite to the claimed version — atomic claim; a crash mid-write
    // leaves only an ignored dot-file, never a torn manifest
    val mdir = new Path(root, ManifestDir)
    if (!fs.exists(mdir)) fs.mkdirs(mdir)
    val tmp = new Path(mdir, s".tmp-${java.util.UUID.randomUUID()}")
    val out = fs.create(tmp, false)
    try out.write(next.entries.toSeq.sorted
      .map { case (rel, t) => s"$t\t$rel" }.mkString("\n").getBytes("UTF-8"))
    finally out.close()
    val target = manifestPath(root, next.version)
    if (fs.exists(target) || !fs.rename(tmp, target)) {
      fs.delete(tmp, false)
      throw new java.nio.file.FileAlreadyExistsException(target.toString,
        null, "concurrent commit won; re-run against the new snapshot")
    }
    next
  }

  /** Keyed upsert with [[TableWriters.upsertParquet]] semantics
    * (last-writer-wins, touched-partitions-only cost) committed through
    * the manifest instead of directory swaps. */
  def upsertManifested(spark: SparkSession, path: String, updates: DataFrame,
      keyCols: Seq[String], partitionCols: Seq[String]): Snapshot = {
    val target = readManifested(spark, path)
    val touchedParts = updates.select(partitionCols.map(col): _*).distinct()
    val affected = target.join(broadcast(touchedParts), partitionCols, "left_semi")
    val dataCols = target.columns.toSeq
    val w = Window.partitionBy(keyCols.map(col): _*)
      .orderBy(col("__is_update").desc, struct(dataCols.map(col): _*).asc)
    val merged = updates.withColumn("__is_update", lit(1))
      .unionByName(affected.withColumn("__is_update", lit(0)))
      .withColumn("__rn", row_number().over(w))
      .where(col("__rn") === 1).drop("__is_update", "__rn")
    overwriteViaManifest(spark, path, partitionCols) { txnDir =>
      merged.write.mode(SaveMode.Overwrite)
        .partitionBy(partitionCols: _*)
        .parquet(txnDir)
    }
  }

  /** Collapses all live txn generations into ONE: rewrites the current
    * table state into a fresh txn dir and publishes a replaceAll manifest
    * pointing every partition at it. Run periodically (like the public
    * formats' OPTIMIZE): read fan-out is one scan per live GENERATION, so
    * a long-running upsert stream degrades planning until compaction
    * resets it to one. `maxRecordsPerFile` doubles as small-file
    * compaction for the partitions themselves. Old txn dirs stay on disk
    * for readers of older manifest versions until [[vacuum]] retires
    * them. */
  def compactManifested(spark: SparkSession, path: String,
      partitionCols: Seq[String], maxRecordsPerFile: Long = 5000000L): Snapshot = {
    val current = readManifested(spark, path)
      .repartition(partitionCols.map(col): _*)
    overwriteViaManifest(spark, path, partitionCols, replaceAll = true) { txn =>
      current.write.mode(SaveMode.Overwrite)
        .option("maxRecordsPerFile", maxRecordsPerFile)
        .partitionBy(partitionCols: _*)
        .parquet(txn)
    }
  }

  /** Retires history: prunes all but the newest `keepManifests` manifest
    * versions, then deletes txn directories no RETAINED manifest
    * references, provided they are older than `minAgeMs` (an in-flight
    * writer's uncommitted txn is always younger than a sanely-chosen age —
    * the same retention contract as the public formats' VACUUM). Every
    * version that survives stays fully time-travel-readable: its txn dirs
    * are in the retained live set by construction. Returns the number of
    * txn dirs removed. */
  def vacuum(spark: SparkSession, path: String,
      minAgeMs: Long = 24L * 3600 * 1000, keepManifests: Int = 10): Int = {
    val root = new Path(path)
    val fs = fsOf(spark, root)
    val mdir = new Path(root, ManifestDir)
    val retained: Seq[Long] =
      if (!fs.exists(mdir)) Seq.empty
      else {
        val versions = fs.listStatus(mdir).map(_.getPath.getName)
          .filter(n => n.endsWith(ManifestSuffix) && !n.startsWith("."))
          .map(_.stripSuffix(ManifestSuffix).toLong).sorted.toSeq
        versions.dropRight(keepManifests)
          .foreach(v => fs.delete(manifestPath(root, v), false))
        versions.takeRight(keepManifests)
      }
    val live: Set[String] = retained
      .flatMap(v => snapshotAt(spark, path, Some(v)).map(_.entries.values.toSet)
        .getOrElse(Set.empty))
      .toSet
    val cutoff = System.currentTimeMillis() - minAgeMs
    val ddir = new Path(root, DataDir)
    if (!fs.exists(ddir)) 0
    else fs.listStatus(ddir)
      .filter(st => st.getPath.getName.startsWith("txn-") &&
        !live.contains(st.getPath.getName) &&
        st.getModificationTime < cutoff)
      .count(st => fs.delete(st.getPath, true))
  }
}
