package graft.operators

import scala.collection.mutable

import org.apache.spark.broadcast.Broadcast
import org.apache.spark.sql.{Column, DataFrame, Row}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{LongType, StructField, StructType}

/** The two-phase distributed prefix sum / rank, extracted once.
  *
  * A global running total (`SUM ... OVER (ORDER BY ...)` with no
  * PARTITION BY) collapses the whole relation onto ONE task — the
  * single-partition-window cliff this codebase keeps designing out
  * (q89 budget selection, q365 bin packing, Mann–Whitney cumB, the
  * perplexity-band rank). Every one of those sites had re-derived the
  * same three steps; this object is that machinery, shared:
  *
  *   1. '''range partition''' by (partCols ++ orderCols) with sampled
  *      boundaries, sort within partitions, `localCheckpoint` — the two
  *      passes MUST see identical partitions, and range sampling is not
  *      deterministic across executions;
  *   2. '''one tiny pass''' sums the value columns per (partition, key)
  *      — the collect is bounded by `partitions × |key domain|`, never
  *      by rows (keys empty ⇒ one row per partition);
  *   3. the driver folds '''exclusive offsets''' (sum over earlier
  *      partitions, and earlier key-runs within them) and broadcasts
  *      them; a map-side second pass then gives every row its exact
  *      global prefix with zero additional shuffles.
  *
  * Exactness contract: values are LongType and the fold is integer
  * addition — associative, so regrouping per partition cannot change
  * any result bit (this is why the KM/NA survival curves do NOT route
  * through here: their cumulative is an IEEE double fold whose
  * regrouping would drift the last ulp).
  *
  * Keyed use (`partCols` non-empty) assumes the KEY domain is
  * driver-bounded (sources, groups — the [[TrainingPrep.selectPerSourceBudget]]
  * contract); it exists so a handful of keys with HUGE per-key value
  * domains (the exact case where `Window.partitionBy(key).orderBy(v)`
  * puts 10^8 distinct values on one task) stay parallel: a hot key
  * SPANS range partitions instead of collapsing onto one.
  */
object DistributedRank {

  /** Offsets + totals, broadcast to the second pass. `offsets((pid, key))`
    * is the per-value exclusive prefix of everything before partition
    * `pid` (and before this key's run inside earlier partitions);
    * `totals(key)` is the per-value grand total. */
  final case class Offsets(
      offsets: Map[(Int, List[Any]), Array[Long]],
      totals: Map[List[Any], Array[Long]]) extends Serializable

  /** Phase 1 + 2 for callers that keep a bespoke final pass (budget
    * early-exit, coverage short-circuit): the checkpointed range-sorted
    * relation plus the broadcast offsets. `valueCols` must already be
    * LongType columns of `df` (project/cast first). */
  final case class Prepared(ranged: DataFrame, bc: Broadcast[Offsets],
      keyIdx: Array[Int], valIdx: Array[Int]) {
    /** Grand total of value `i` across all keys. */
    def total(i: Int = 0): Long = bc.value.totals.values.map(_(i)).sum
    // No eager release hook: every caller's final pass is lazy (the
    // prefixSum/prefixMax results, the TrainingPrep budget scans), so the
    // checkpoint blocks and broadcast are reclaimed by the ContextCleaner
    // when the result is dropped — an explicit free would be unsafe to
    // call before the last action and dead code otherwise.
  }

  /** The exactness argument (regrouping cannot change a bit) holds for
    * ANY associative integer fold, not just addition — `prepare`/the
    * second pass thread the monoid so running MAX (cummax — skyline
    * frontiers, record sweeps) rides the identical two-phase machinery.
    * Additions skip nulls as 0; max skips them as the identity
    * [[Long.MinValue]], which doubles as the "nothing before" sentinel
    * an exclusive first row reports (callers compare with `>`, which a
    * real value always wins against the sentinel). */
  private val SumFold: (Long, Long) => Long = _ + _
  private val MaxFold: (Long, Long) => Long = math.max

  def prepare(df: DataFrame, partCols: Seq[String], orderCols: Seq[Column],
      valueCols: Seq[String], partitions: Int = 0,
      fold: (Long, Long) => Long = SumFold,
      identity: Long = 0L): Prepared = {
    val spark = df.sparkSession
    val nParts = if (partitions > 0) partitions
      else spark.sessionState.conf.numShufflePartitions
    val keys = partCols.map(col)
    val ranged = df
      .repartitionByRange(nParts, keys ++ orderCols: _*)
      .sortWithinPartitions(keys ++ orderCols: _*)
      .localCheckpoint() // both passes must see identical sampled ranges
    val cols = ranged.columns
    val keyIdx = partCols.map(cols.indexOf(_)).toArray
    val valIdx = valueCols.map(cols.indexOf(_)).toArray
    require(valIdx.forall(_ >= 0) && keyIdx.forall(_ >= 0),
      s"missing columns among ${cols.mkString(",")}")
    // key values become boxed map keys below; floating-point boxing makes
    // NaN != NaN, so ONE NaN-keyed group would explode into one map entry
    // per row (unbounded driver collect) with wrong offsets — reject the
    // type instead of the value (callers key by ids/names/bins anyway)
    keyIdx.foreach { i =>
      val dt = ranged.schema(i).dataType
      require(dt != org.apache.spark.sql.types.FloatType &&
        dt != org.apache.spark.sql.types.DoubleType,
        s"partition key ${cols(i)} is $dt: floating-point keys are " +
          "rejected (NaN boxing breaks map-key equality) — bin or " +
          "stringify the key first")
    }
    valIdx.foreach { i =>
      require(ranged.schema(i).dataType == LongType,
        s"value column ${cols(i)} must be LongType (pre-cast it)")
    }
    val nv = valIdx.length
    val f = fold
    val id = identity
    // pass 1: per-(partition, key-run) folds. LinkedHashMap preserves the
    // sorted first-encounter order, so the driver fold below is the true
    // global order. One collected row per (partition, key) — bounded by
    // the partition count times the key domain, never by data.
    // NULL value cells contribute the fold identity, the same per-row
    // behavior as a window aggregate (which skips nulls): the row still
    // receives the running prefix of everything before it. (A key whose
    // values are ALL null totals `identity` here where SQL would say
    // NULL — callers with that edge case coalesce upstream.)
    val partSums: Array[(Int, Seq[(List[Any], Array[Long])])] =
      ranged.rdd.mapPartitionsWithIndex { (pid, it) =>
        val m = mutable.LinkedHashMap.empty[List[Any], Array[Long]]
        it.foreach { r =>
          val key = keyIdx.map(r.get(_): Any).toList
          val acc = m.getOrElseUpdate(key, Array.fill(nv)(id))
          var i = 0
          while (i < nv) {
            if (!r.isNullAt(valIdx(i))) acc(i) = f(acc(i), r.getLong(valIdx(i)))
            i += 1
          }
        }
        Iterator((pid, m.toSeq))
      }.collect()
    // exclusive offsets: value folds over partitions (and earlier key-runs)
    // strictly before (pid, key)
    val running = mutable.Map.empty[List[Any], Array[Long]]
    val offsets = partSums.sortBy(_._1).flatMap { case (pid, sums) =>
      sums.map { case (key, tot) =>
        val off = running.getOrElse(key, Array.fill(nv)(id))
        running.update(key, Array.tabulate(nv)(i => f(off(i), tot(i))))
        ((pid, key), off)
      }
    }.toMap
    val bc = spark.sparkContext.broadcast(
      Offsets(offsets, running.map { case (k, v) => (k, v) }.toMap))
    Prepared(ranged, bc, keyIdx, valIdx)
  }

  /** The general product: `df`'s columns plus one running-prefix column
    * per entry of `cums` (`valueCol -> outCol`), inclusive or exclusive,
    * plus (optionally) per-key grand-total columns (`valueCol ->
    * totalCol`). Bit-exact twin of
    * `sum(value) OVER (PARTITION BY partCols ORDER BY orderCols ROWS
    * UNBOUNDED PRECEDING [AND 1 PRECEDING])` for LongType values —
    * spec-asserted in DistributedRankSpec — with no Window node and no
    * single-partition exchange anywhere in the plan. */
  def prefixSum(df: DataFrame, partCols: Seq[String], orderCols: Seq[Column],
      cums: Seq[(String, String)], inclusive: Boolean,
      totals: Seq[(String, String)] = Nil,
      partitions: Int = 0): DataFrame =
    prefixFold(df, partCols, orderCols, cums, inclusive, totals, partitions,
      SumFold, 0L)

  /** Running MAX twin of [[prefixSum]] — `max(value) OVER (... ROWS
    * UNBOUNDED PRECEDING [AND 1 PRECEDING])` for LongType values with
    * no Window node. An exclusive prefix with nothing before it reports
    * the [[Long.MinValue]] sentinel (the window form says NULL there):
    * callers keep/compare with `>`, which any real value wins. */
  def prefixMax(df: DataFrame, partCols: Seq[String], orderCols: Seq[Column],
      cums: Seq[(String, String)], inclusive: Boolean,
      partitions: Int = 0): DataFrame =
    prefixFold(df, partCols, orderCols, cums, inclusive, Nil, partitions,
      MaxFold, Long.MinValue)

  private def prefixFold(df: DataFrame, partCols: Seq[String],
      orderCols: Seq[Column], cums: Seq[(String, String)], inclusive: Boolean,
      totals: Seq[(String, String)], partitions: Int,
      fold: (Long, Long) => Long, identity: Long): DataFrame = {
    val valueCols = (cums.map(_._1) ++ totals.map(_._1)).distinct
    val p = prepare(df, partCols, orderCols, valueCols, partitions,
      fold, identity)
    val spark = df.sparkSession
    val cumVal = cums.map(c => valueCols.indexOf(c._1)).toArray
    val totVal = totals.map(c => valueCols.indexOf(c._1)).toArray
    val outSchema = StructType(p.ranged.schema.fields ++
      cums.map(c => StructField(c._2, LongType, nullable = false)) ++
      totals.map(c => StructField(c._2, LongType, nullable = false)))
    val keyIdx = p.keyIdx
    val valIdx = p.valIdx
    val bc = p.bc
    val nv = valIdx.length
    val inc = inclusive
    val f = fold
    val id = identity
    // the pass indexes the broadcast offsets by RANGED's partition number,
    // so it must receive the RDD's OWN split index — TaskContext
    // .getPartitionId() is the final-RDD-of-the-task id and is offset when
    // the result runs as a non-first union child or under a coalesce
    // (the q472/SortedNeighborhood failure class; Round17OpsSpec pins it)
    val outRdd = p.ranged.rdd.mapPartitionsWithIndex { (pid, it) =>
      // running[i] = exclusive prefix of value i for the CURRENT key run
      var curKey: List[Any] = null
      var started = false
      var running: Array[Long] = null
      it.map { r =>
        val key = keyIdx.map(r.get(_): Any).toList
        if (!started || key != curKey) {
          started = true; curKey = key
          running = bc.value.offsets.getOrElse((pid, key), Array.fill(nv)(id))
            .clone()
        }
        // same null-as-identity contract as pass 1 (window aggs skip nulls)
        val vals = valIdx.map(i => if (r.isNullAt(i)) id else r.getLong(i))
        val cumsOut = cumVal.map { i =>
          if (inc) f(running(i), vals(i)) else running(i)
        }
        var i = 0
        while (i < nv) { running(i) = f(running(i), vals(i)); i += 1 }
        val totsOut = totVal.map(i => bc.value.totals(key)(i))
        Row.fromSeq(r.toSeq ++ cumsOut ++ totsOut)
      }
    }
    spark.createDataFrame(outRdd, outSchema)
  }
}
