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
    keyedRangeWrite(
      df.withColumn("__lkey", zValue(col(colA), col(colB), bits)),
      path, nFiles)

  /** Shared tail of the curve-ordered writers: range-partition + local
    * sort on the precomputed `__lkey`, drop it, write. ONE definition so
    * a layout-path change (writer conf, sort discipline) cannot drift
    * between the Morton and Hilbert twins. */
  private def keyedRangeWrite(keyed: DataFrame, path: String,
      nFiles: Int): Unit =
    keyed.repartitionByRange(nFiles, col("__lkey"))
      .sortWithinPartitions("__lkey")
      .drop("__lkey")
      .write.mode("overwrite").parquet(path)

  /** Hilbert-curve key: maps a (x, y) cell in the 2^bits × 2^bits grid
    * to its position along the Hilbert space-filling curve (Hilbert
    * 1891; the xy→d walk is the classic bit-level algorithm). Hilbert
    * beats Morton for layout clustering because the curve NEVER jumps:
    * consecutive keys are always 4-adjacent cells, so every contiguous
    * key range covers a compact blob — Morton's Z-shape takes a long
    * diagonal jump at every quadrant seam, stretching some file
    * envelopes across half the plane (the q455 register row measures
    * exactly this difference on the same data and file count).
    *
    * Pure integer/CASE column algebra, unrolled per bit level from the
    * most significant down, carrying the (x, y) rotation state as
    * column expressions — codegen'd end to end, no UDF. [[hilbertSql]]
    * emits the IDENTICAL algebra for the oracle, so the key oracles
    * bit-for-bit (the [[zValue]]/[[zValueSql]] twin-emitter pattern). */
  def hilbertKey(xCol: Column, yCol: Column, bits: Int = 8): Column = {
    require(bits >= 1 && bits <= 16, s"hilbert bits=$bits out of range")
    val n = 1L << bits
    // wrap into [0, 2^bits) exactly like zValue's documented behavior —
    // WITHOUT the mask an out-of-range input survives into the
    // reflection step (n-1-x goes negative) and corrupts the key, which
    // destroys curve locality silently (content stays correct, the
    // layout benefit evaporates)
    var x = xCol.cast("long").bitwiseAND(lit(n - 1))
    var y = yCol.cast("long").bitwiseAND(lit(n - 1))
    var d = lit(0L)
    for (i <- (bits - 1) to 0 by -1) {
      val s = 1L << i
      val rx = shiftright(x, i).bitwiseAND(lit(1L))
      val ry = shiftright(y, i).bitwiseAND(lit(1L))
      d = d + lit(s * s) * ((lit(3L) * rx).bitwiseXOR(ry))
      // rotate the frame for the next level: ry==0 → reflect (if rx==1)
      // then swap x/y; ry==1 → identity
      val xr = when(ry === 0L, when(rx === 1L, lit(n - 1) - y)
        .otherwise(y)).otherwise(x)
      val yr = when(ry === 0L, when(rx === 1L, lit(n - 1) - x)
        .otherwise(x)).otherwise(y)
      x = xr
      y = yr
    }
    d
  }

  /** [[hilbertKey]] materialized one rotation LEVEL per projection.
    * The single-Column form nests each level's (x, y) inside the next
    * level's CASE branches, so the UNEXPANDED tree grows ~3^bits —
    * at bits=8 codegen overflows and falls back to interpreted
    * evaluation (measured 100 s for a 1.5M-row scan). Chaining
    * `withColumn` per level pins each (x, y, d) as a real attribute;
    * Catalyst's CollapseProject keeps multiply-referenced non-cheap
    * aliases in their own projections, so the plan stays linear in
    * `bits` and whole-stage codegen'd. Always use this form on a
    * corpus-shaped scan; the Column form is fine for model-sized
    * relations and specs. */
  def withHilbertKey(df: DataFrame, xCol: Column, yCol: Column,
      out: String, bits: Int = 8): DataFrame = {
    require(bits >= 1 && bits <= 16, s"hilbert bits=$bits out of range")
    val n = 1L << bits
    var cur = df // wrap into [0, 2^bits) — see hilbertKey
      .withColumn("__hx", xCol.cast("long").bitwiseAND(lit(n - 1)))
      .withColumn("__hy", yCol.cast("long").bitwiseAND(lit(n - 1)))
      .withColumn(out, lit(0L))
    for (i <- (bits - 1) to 0 by -1) {
      val s = 1L << i
      val rx = shiftright(col("__hx"), i).bitwiseAND(lit(1L))
      val ry = shiftright(col("__hy"), i).bitwiseAND(lit(1L))
      cur = cur
        .withColumn(out,
          col(out) + lit(s * s) * ((lit(3L) * rx).bitwiseXOR(ry)))
        .withColumn("__hx2", when(ry === 0L,
          when(rx === 1L, lit(n - 1) - col("__hy")).otherwise(col("__hy")))
          .otherwise(col("__hx")))
        .withColumn("__hy2", when(ry === 0L,
          when(rx === 1L, lit(n - 1) - col("__hx")).otherwise(col("__hx")))
          .otherwise(col("__hy")))
        .withColumn("__hx", col("__hx2")).withColumn("__hy", col("__hy2"))
        .drop("__hx2", "__hy2")
    }
    cur.drop("__hx", "__hy")
  }

  /** The matching DuckDB/ANSI SQL for [[hilbertKey]]: emits one chained
    * CTE level per bit carrying (x, y, d) — the same reflect-then-swap
    * algebra, so engine and oracle agree bit-for-bit. `src` must expose
    * the caller's row columns plus `$xa`/`$ya`; the returned fragment
    * ends with a CTE named `hf$sfx` exposing everything plus `hkey`. */
  def hilbertSql(src: String, xa: String, ya: String, bits: Int = 8,
      sfx: String = ""): String = {
    val n = 1L << bits
    val lv0 = s"h0$sfx AS (SELECT *, CAST($xa AS BIGINT) & ${n - 1} AS hx, " +
      s"CAST($ya AS BIGINT) & ${n - 1} AS hy, CAST(0 AS BIGINT) AS hd FROM $src)"
    val levels = ((bits - 1) to 0 by -1).zipWithIndex.map { case (i, k) =>
      val s = 1L << i
      val prev = s"h$k$sfx"
      s"""h${k + 1}$sfx AS (SELECT * EXCLUDE (hx, hy, hd),
         |    CASE WHEN ((hy >> $i) & 1) = 0 THEN
         |      CASE WHEN ((hx >> $i) & 1) = 1 THEN ${n - 1} - hy ELSE hy END
         |    ELSE hx END AS hx,
         |    CASE WHEN ((hy >> $i) & 1) = 0 THEN
         |      CASE WHEN ((hx >> $i) & 1) = 1 THEN ${n - 1} - hx ELSE hx END
         |    ELSE hy END AS hy,
         |    hd + ${s * s} * xor(3 * ((hx >> $i) & 1), (hy >> $i) & 1)
         |      AS hd
         |  FROM $prev)""".stripMargin
    }
    val fin = s"hf$sfx AS (SELECT * EXCLUDE (hx, hy, hd), hd AS hkey " +
      s"FROM h$bits$sfx)"
    (lv0 +: levels :+ fin).mkString(",\n")
  }

  /** Writes `df` as `nFiles` parquet files range-partitioned and sorted
    * by the Hilbert key of (colA, colB) — [[zOrderedWrite]] with the
    * jump-free curve, so every file's (colA, colB) min/max envelope is
    * one compact blob even when file boundaries straddle quadrant
    * seams (the q455-measured advantage). Uses [[withHilbertKey]] (one
    * projection per rotation level — the Column form's nested CASEs
    * fall out of codegen at corpus scale).
    *
    * SCALE: identical shape to [[zOrderedWrite]] — one sampled range
    * exchange + local sort, no single-partition anything. */
  def hilbertOrderedWrite(df: DataFrame, colA: String, colB: String,
      path: String, nFiles: Int, bits: Int = 16): Unit =
    keyedRangeWrite(
      withHilbertKey(df, col(colA), col(colB), "__lkey", bits),
      path, nFiles)

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
