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
  *   - a rounded double that can be zero gets `+ 0.0` on BOTH sides:
  *     DuckDB's round() of a tiny negative yields IEEE -0.0 where Spark's
  *     BigDecimal round yields +0.0 — numerically equal, distinct to a
  *     dtype-sensitive value hash (the q435 sf0.1 lesson)
  *   - oracle aggregate outputs are never left HUGEINT (sum/`//` widen):
  *     HUGEINT's pandas dtype is duckdb-version-dependent (the q365/q426
  *     r13 lesson); CAST(... AS BIGINT) every integer output column
  *   - output columns are never array/map-typed: the harness row-sorts
  *     through pandas, which cannot order list cells (the q163 r13
  *     lesson) — explode to scalar rows or array_join instead
  */
case class Q(name: String,
    fn: (SparkSession, String) => DataFrame,
    oracle: Option[String],
    /** headline queries run in Bench */
    bench: Boolean = false)

object Tables {
  def t(spark: SparkSession, dir: String, name: String): DataFrame =
    spark.read.parquet(s"${dir.stripSuffix("/")}/$name.parquet")

  /** Fixed per-(dataset, name) temp location for write-roundtrip rows
    * (q95/q460): overwritten per run, so disk stays flat across
    * executions; hashing the dataset dir keeps sf0.01/sf0.1 runs from
    * clobbering each other. ONE definition so the roundtrip twins can't
    * drift. */
  def roundtripLoc(dir: String, name: String): String = {
    val d = dir.stripSuffix("/")
    new java.io.File(
      new java.io.File(sys.props("java.io.tmpdir"), s"graft-$name"),
      java.lang.Integer.toHexString(d.hashCode) + s"/$name").toString
  }

  /** [[roundtripLoc]] with any prior run's tree deleted — the fresh
    * scratch dir every write-roundtrip row starts from (one definition;
    * the per-row rmTree copies it replaced drifted once already). */
  def freshRoundtripDir(dir: String, name: String): java.io.File = {
    val loc = new java.io.File(roundtripLoc(dir, name))
    def rmTree(f: java.io.File): Unit = {
      Option(f.listFiles()).getOrElse(Array.empty).foreach(rmTree)
      f.delete(); ()
    }
    if (loc.exists()) rmTree(loc)
    loc
  }

  /** The events table: `ts` is normalized to LongType epoch-NANOSECONDS
    * regardless of how the parquet encodes it. Integer nanos keep ordering,
    * bucketing, and gap arithmetic exact (no µs truncation) — queries must
    * use `tsSeconds`/ns literals, and oracle SQL uses epoch(ts).
    *
    * Two physical encodings exist across testdata generations:
    * TIMESTAMP(NANOS) (unreadable as TimestampType by Spark 4 → read under
    * the nanosAsLong legacy flag, already epoch-ns), and TIMESTAMP(MICROS)
    * (read as TIMESTAMP_NTZ → cast to TimestampType under the UTC session
    * timezone every session pins, then unix_micros × 1000). Both paths land
    * on the same instants DuckDB's epoch(ts) sees. */
  def events(spark: SparkSession, dir: String): DataFrame = {
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    val df = t(spark, dir, "events")
    df.schema("ts").dataType match {
      case org.apache.spark.sql.types.LongType => df
      case _ => df.withColumn("ts",
        org.apache.spark.sql.functions.unix_micros(
          df("ts").cast(org.apache.spark.sql.types.TimestampType)) * 1000L)
    }
  }

  val NanosPerSecond = 1000000000L
}
