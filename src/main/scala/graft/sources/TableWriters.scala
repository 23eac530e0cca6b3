package graft.sources

import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Sink layer (SURVEY §2.2 K1-K3 widened to the formats a lakehouse needs).
  *
  * SCALE: partitioned parquet is the default shape — writers take the
  * partition columns explicitly so scans get partition PRUNING (verified in
  * WritersSpec via PartitionFilters in the plan), and dynamic partition
  * overwrite keeps re-runs incremental (only touched partitions rewrite).
  * CSV/JSON are interchange formats: fine for exports, never for the hot
  * path (no pushdown, no column pruning, full-row parse).
  */
object TableWriters {

  def parquetPartitioned(df: DataFrame, path: String, partitionCols: Seq[String],
      mode: SaveMode = SaveMode.Overwrite): Unit =
    df.write.mode(mode)
      .option("partitionOverwriteMode", "dynamic")
      .partitionBy(partitionCols: _*)
      .parquet(path)

  def csv(df: DataFrame, path: String): Unit =
    df.write.mode(SaveMode.Overwrite).option("header", true).csv(path)

  def json(df: DataFrame, path: String): Unit =
    df.write.mode(SaveMode.Overwrite).json(path)

  /** Writes a partitioned result to a STAGING directory next to `path`,
    * then swaps each staged leaf partition directory into the target.
    * The staged copy is complete and durable on disk BEFORE the first
    * destructive action, so a crash at any point loses no committed data:
    * before the swap the target is untouched (orphan staging dirs are
    * cleaned opportunistically below); mid-swap, every partition is either
    * its complete old or complete new state (directory rename is atomic on
    * HDFS/POSIX filesystems — on object stores without atomic rename a
    * transactional table format should own the commit instead). Writing to
    * a path DIFFERENT from the one being read also removes the need to
    * checkpoint the plan that reads the target. */
  private def overwriteViaStaging(spark: SparkSession, path: String,
      partitionCols: Seq[String])(writeTo: String => Unit): Unit = {
    import org.apache.hadoop.fs.Path
    val target = new Path(path)
    val fs = target.getFileSystem(spark.sparkContext.hadoopConfiguration)
    // sweep staging leftovers from crashed predecessors (same prefix)
    val prefix = s".${target.getName}.staging-"
    if (fs.exists(target.getParent))
      fs.listStatus(target.getParent).filter(_.getPath.getName.startsWith(prefix))
        .foreach(st => fs.delete(st.getPath, true))
    val staging = new Path(target.getParent, prefix + java.util.UUID.randomUUID())
    writeTo(staging.toString)
    try {
      // (path, relative-partition-path) pairs; the relative path is built
      // from directory NAMES, never by string-stripping absolute paths
      // (listStatus returns scheme-qualified paths that would not prefix-
      // match an unqualified staging path)
      def leaves(p: Path, depth: Int, rel: String): Seq[(Path, String)] =
        if (depth == 0) Seq((p, rel))
        else fs.listStatus(p).toSeq.filter(_.isDirectory).map(_.getPath)
          .filter(_.getName.contains("="))
          .flatMap(c => leaves(c, depth - 1,
            if (rel.isEmpty) c.getName else s"$rel/${c.getName}"))
      leaves(staging, partitionCols.length, "").foreach { case (src, rel) =>
        val dst = if (rel.isEmpty) target else new Path(target, rel)
        if (fs.exists(dst)) fs.delete(dst, true)
        if (!fs.exists(dst.getParent)) fs.mkdirs(dst.getParent)
        if (!fs.rename(src, dst))
          throw new java.io.IOException(s"staging swap failed: $src -> $dst")
      }
    } finally fs.delete(staging, true)
  }

  /** Keyed upsert (MERGE-by-key) into a partitioned parquet table:
    * update rows replace target rows with the same key, new keys append —
    * the reference's last-writer-wins merge semantics (validator.py:96-98)
    * promoted to a table primitive.
    *
    * CONTRACT: a key's partition values must be STABLE (partition columns
    * a function of the key). Only partitions present in the updates are
    * read and rewritten, so an update that moves a key to a different
    * partition would leave the old row in the untouched partition — the
    * same caveat every partition-pruned MERGE has. Updates should be
    * key-unique; duplicate update keys pick a deterministic winner
    * (lexicographically smallest row), so replays converge.
    *
    * SCALE: cost is proportional to the TOUCHED partitions, never the
    * table (broadcast semi-join on the partition values, staged write of
    * only those partitions). DURABILITY: the merged partitions land in a
    * staging dir first and are swapped in per-partition
    * ([[overwriteViaStaging]]) — the pre-merge data is never destroyed
    * before its replacement is fully written, so a failure at any point
    * leaves every partition complete (old or new) and re-running the same
    * upsert converges. */
  def upsertParquet(spark: SparkSession, path: String, updates: DataFrame,
      keyCols: Seq[String], partitionCols: Seq[String]): Unit = {
    val target = spark.read.parquet(path)
    val touched = updates.select(partitionCols.map(col): _*).distinct()
    val affected = target.join(broadcast(touched), partitionCols, "left_semi")
    val dataCols = target.columns.toSeq
    val w = Window.partitionBy(keyCols.map(col): _*)
      .orderBy(col("__is_update").desc, struct(dataCols.map(col): _*).asc)
    val merged = updates.withColumn("__is_update", lit(1))
      .unionByName(affected.withColumn("__is_update", lit(0)))
      .withColumn("__rn", row_number().over(w))
      .where(col("__rn") === 1).drop("__is_update", "__rn")
    overwriteViaStaging(spark, path, partitionCols) { staged =>
      merged.write.mode(SaveMode.Overwrite)
        .partitionBy(partitionCols: _*)
        .parquet(staged)
    }
  }

  /** Small-file compaction for a partitioned parquet table — the
    * operational tail of incremental/streaming appends (every micro-batch
    * lands >=1 file per partition; scans degrade with file count).
    * Rewrites each selected partition's data into ~`maxRecordsPerFile`-row
    * files: one shuffle on the partition columns, dynamic overwrite,
    * content unchanged (spec-verified).
    *
    * SCALE: pass `partitionPredicate` (a predicate on the partition
    * columns — e.g. `col("date") >= last_week`) from the scheduled job so
    * only recently-appended partitions are read (partition-pruned scan)
    * and rewritten; omitting it compacts the whole table. DURABILITY: the
    * compacted partitions are staged and swapped in per-partition
    * ([[overwriteViaStaging]]) — source files are never deleted before
    * their compacted replacement is fully written. */
  def compactParquet(spark: SparkSession, path: String,
      partitionCols: Seq[String], maxRecordsPerFile: Long = 5000000L,
      partitionPredicate: Option[org.apache.spark.sql.Column] = None): Unit = {
    val compacted = spark.read.parquet(path)
      .where(partitionPredicate.getOrElse(lit(true)))
      .repartition(partitionCols.map(col): _*)
    overwriteViaStaging(spark, path, partitionCols) { staged =>
      compacted.write.mode(SaveMode.Overwrite)
        .option("maxRecordsPerFile", maxRecordsPerFile)
        .partitionBy(partitionCols: _*)
        .parquet(staged)
    }
  }

  def readParquet(spark: SparkSession, path: String): DataFrame =
    spark.read.parquet(path)

  def readCsv(spark: SparkSession, path: String, schema: Option[String] = None): DataFrame = {
    val r = spark.read.option("header", true)
    schema.fold(r.option("inferSchema", true))(s => r.schema(s)).csv(path)
  }

  def readJson(spark: SparkSession, path: String): DataFrame =
    spark.read.json(path)
}
