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
    * SCALE: only partitions PRESENT IN THE UPDATES are read, merged and
    * rewritten (broadcast semi-join on the partition values + dynamic
    * partition overwrite) — cost is proportional to the touched
    * partitions, never the table. The merged set is staged with
    * localCheckpoint before the write because a parquet path cannot be
    * lazily read and overwritten in one plan; a transactional table
    * format would swap manifests instead, same write set. */
  def upsertParquet(spark: SparkSession, path: String, updates: DataFrame,
      keyCols: Seq[String], partitionCols: Seq[String]): Unit = {
    val target = spark.read.parquet(path)
    val touched = updates.select(partitionCols.map(col): _*).distinct()
    val affected = target.join(broadcast(touched), partitionCols, "left_semi")
    val w = Window.partitionBy(keyCols.map(col): _*).orderBy(col("__is_update").desc)
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
    * Rewrites each partition's data into ~`maxRecordsPerFile`-row files:
    * one shuffle on the partition columns, dynamic overwrite, content
    * unchanged (spec-verified). Run it per recent partition from a
    * scheduled job at scale. */
  def compactParquet(spark: SparkSession, path: String,
      partitionCols: Seq[String], maxRecordsPerFile: Long = 5000000L): Unit = {
    val staged = spark.read.parquet(path)
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
