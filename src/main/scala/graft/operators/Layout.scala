package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Data-layout operators: multi-dimensional clustering of written files so
  * that range predicates on EITHER dimension prune files and row groups.
  *
  * Sorting a table by (a, b) clusters a perfectly but scatters b; a
  * Z-order (Morton) key interleaves the bits of both, so rows close in
  * the (a, b) plane land close in the written order and every file's
  * min/max envelope covers a small rectangle instead of a full stripe.
  * Parquet keeps per-file and per-row-group min/max stats for both
  * columns, so a 2-D box query skips most files under either predicate —
  * the standard warehouse trick (Delta/Iceberg OPTIMIZE ZORDER BY) built
  * from plain Spark primitives.
  */
object Layout {

  /** Morton key: interleaves the low `bits` bits of two non-negative
    * integer columns (a in even positions, b in odd). Pure codegen'd
    * integer arithmetic — bit-identical in every engine with `>> & <<`
    * operators, so it oracles directly. 16+16 bits fit a BIGINT with
    * room to spare; values outside [0, 2^bits) wrap (callers bucket or
    * clamp first for non-integer dimensions). */
  def zValue(a: Column, b: Column, bits: Int = 16): Column = {
    val av = a.cast("long")
    val bv = b.cast("long")
    (0 until bits).foldLeft(lit(0L)) { (acc, i) =>
      acc
        .bitwiseOR(shiftleft(shiftright(av, i).bitwiseAND(lit(1L)), 2 * i))
        .bitwiseOR(shiftleft(shiftright(bv, i).bitwiseAND(lit(1L)), 2 * i + 1))
    }
  }

  /** The matching DuckDB/ANSI SQL expression, for oracle parity. The
    * operands are cast to BIGINT exactly as [[zValue]] casts to long —
    * without the cast an INTEGER input with bit 15 set shifts to
    * `1 << 31`, which overflows 32-bit engines. */
  def zValueSql(a: String, b: String, bits: Int = 16): String = {
    val (av, bv) = (s"CAST($a AS BIGINT)", s"CAST($b AS BIGINT)")
    (0 until bits).map { i =>
      s"((($av >> $i) & 1) << ${2 * i}) | ((($bv >> $i) & 1) << ${2 * i + 1})"
    }.mkString("(", " | ", ")")
  }

  /** Writes `df` as `nFiles` parquet files range-partitioned and sorted
    * by the Morton key of (colA, colB), then drops the key — the
    * clustering lives in the file layout and its min/max stats, not in
    * the schema.
    *
    * SCALE: repartitionByRange samples the key distribution and gives
    * each output file an equal-sized, CONTIGUOUS z-range — balanced
    * files whose (colA, colB) envelopes tile the plane. One range
    * exchange + local sort; no global single-partition anything. */
  def zOrderedWrite(df: DataFrame, colA: String, colB: String,
      path: String, nFiles: Int, bits: Int = 16): Unit =
    df.withColumn("__zkey", zValue(col(colA), col(colB), bits))
      .repartitionByRange(nFiles, col("__zkey"))
      .sortWithinPartitions("__zkey")
      .drop("__zkey")
      .write.mode("overwrite").parquet(path)

  /** Rendezvous (highest-random-weight, Thaler & Ravishankar 1998) shard
    * assignment: each key goes to the shard whose portable 60-bit hash
    * of "key#shard" is largest. Unlike `pmod(hash, n)`, growing the
    * shard count moves ONLY the keys whose new shard wins — an expected
    * 1/(n+1) of the data relocates instead of (n-1)/n, which is the
    * difference between adding capacity and rewriting the warehouse.
    *
    * Pure codegen'd expression (n md5s + one `greatest` over (hash,
    * shard) structs — the struct order makes any tie break toward the
    * larger shard id, deterministically); bit-identical to the DuckDB
    * arg_max-over-md5 oracle. Scan-speed, no shuffle, no driver state. */
  def rendezvousShard(idCol: Column, nShards: Int): Column = {
    require(nShards >= 2, "rendezvous needs at least two shards")
    val cands = (0 until nShards).map { sh =>
      struct(graft.expressions.PortableHash.md5Hash60(
        concat(idCol.cast("string"), lit(s"#$sh"))).as("h"),
        lit(sh).as("s"))
    }
    greatest(cands: _*).getField("s")
  }
}
