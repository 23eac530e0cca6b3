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
    * table (broadcast semi-join on the partition values + dynamic
    * partition overwrite). The merged set is staged with localCheckpoint
    * because a parquet path cannot be lazily read and overwritten in one
    * plan; the write itself is not transactional — on a mid-write
    * failure, re-running the same upsert converges (merge is idempotent),
    * where a transactional table format would swap manifests instead. */
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
      .localCheckpoint()
    parquetPartitioned(merged, path, partitionCols)
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
    * and rewritten; omitting it compacts the whole table. */
  def compactParquet(spark: SparkSession, path: String,
      partitionCols: Seq[String], maxRecordsPerFile: Long = 5000000L,
      partitionPredicate: Option[org.apache.spark.sql.Column] = None): Unit = {
    val staged = spark.read.parquet(path)
      .where(partitionPredicate.getOrElse(lit(true)))
      .repartition(partitionCols.map(col): _*)
      .localCheckpoint()
    staged.write.mode(SaveMode.Overwrite)
      .option("partitionOverwriteMode", "dynamic")
      .option("maxRecordsPerFile", maxRecordsPerFile)
      .partitionBy(partitionCols: _*)
      .parquet(path)
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
