package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}

/** One registered engine query: the Spark implementation plus (where
  * SQL-expressible) the DuckDB oracle the driver hash-compares against.
  *
  * Oracle-match conventions used across all queries:
  *   - every output column is aliased identically on both sides
  *   - every query ends with a total ORDER BY on a unique key
  *   - double aggregates are round()ed (2-6 dp) on both sides so partial-agg
  *     accumulation-order differences between engines can't flip a hash
  *   - integer-typed outputs are cast to BIGINT on both sides (DuckDB
  *     sum(int) is HUGEINT, Spark length() is INT, ...)
  *   - timestamps never appear raw in outputs (strftime/date_format strings
  *     or epoch BIGINTs instead) to dodge tz-awareness representation drift
  */
case class Q(name: String,
    fn: (SparkSession, String) => DataFrame,
    oracle: Option[String],
    /** headline queries run in Bench */
    bench: Boolean = false)

object Tables {
  def t(spark: SparkSession, dir: String, name: String): DataFrame =
    spark.read.parquet(s"${dir.stripSuffix("/")}/$name.parquet")

  /** The events table carries TIMESTAMP(NANOS) parquet, which Spark 4 won't
    * read as TimestampType. We read it under the nanosAsLong legacy flag, so
    * `ts` is LongType epoch-NANOSECONDS here. Integer nanos keep ordering,
    * bucketing, and gap arithmetic exact (no µs truncation) — queries must
    * use `tsSeconds`/ns literals, and oracle SQL uses epoch(ts). */
  def events(spark: SparkSession, dir: String): DataFrame = {
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    t(spark, dir, "events")
  }

  val NanosPerSecond = 1000000000L
}
