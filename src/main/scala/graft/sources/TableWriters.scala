package graft.sources

import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}

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

  def readParquet(spark: SparkSession, path: String): DataFrame =
    spark.read.parquet(path)

  def readCsv(spark: SparkSession, path: String, schema: Option[String] = None): DataFrame = {
    val r = spark.read.option("header", true)
    schema.fold(r.option("inferSchema", true))(s => r.schema(s)).csv(path)
  }

  def readJson(spark: SparkSession, path: String): DataFrame =
    spark.read.json(path)
}
