package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Event-sequence analytics over the (user, type, ts) shape — the
  * batch twins of the streaming sessionization in
  * [[graft.streaming.EventsStream]]. */
object EventOps {

  /** First-touch conversion funnel: for each user, the earliest
    * occurrence of `stages.head`, then for every later stage the
    * earliest matching event within `windowNs` AFTER the previous
    * stage's timestamp. Emits one row per user who entered the funnel:
    * the per-stage timestamps (null once the chain breaks) and the
    * count of stages reached. "First-touch" is the deterministic
    * greedy semantic every funnel dashboard uses — a later entry event
    * that would have converted does NOT rescue a user whose earliest
    * entry didn't.
    *
    * SCALE: one conditional-min aggregation per stage, every one keyed
    * on the user — after the first aggregation the accumulator is
    * already hash-partitioned by user_id, so each later join re-shuffles
    * only the (stage-filtered, far smaller) event slice, never the
    * accumulated funnel. Stage filters sit directly on the scan
    * (pushable). No windows, no per-user event collection — state per
    * user is exactly `stages.length` timestamps. */
  def funnelStages(events: DataFrame, stages: Seq[String], windowNs: Long,
      userCol: String = "user_id", typeCol: String = "event_type",
      tsCol: String = "ts"): DataFrame = {
    require(stages.nonEmpty, "funnel needs at least one stage")
    val e = events.select(col(userCol).as("user_id"),
      col(typeCol).as("et"), col(tsCol).as("tns"))
    var acc = e.where(col("et") === stages.head)
      .groupBy("user_id").agg(min("tns").as("t0"))
    for ((s, i) <- stages.tail.zipWithIndex) {
      val prev = s"t$i"
      val nxt = e.where(col("et") === s)
        .join(acc.select(col("user_id"), col(prev)), Seq("user_id"))
        .where(col("tns") >= col(prev) && col("tns") <= col(prev) + windowNs)
        .groupBy("user_id").agg(min("tns").as(s"t${i + 1}"))
      acc = acc.join(nxt, Seq("user_id"), "left")
    }
    val stage = stages.indices
      .map(i => when(col(s"t$i").isNotNull, 1).otherwise(0))
      .reduce((a: Column, b: Column) => a + b)
    acc.withColumn("stage", stage.cast("long"))
  }

  /** Cohort retention: users grouped by first-activity period (cohort),
    * counted per later period they return in. `periodNs` buckets event
    * time from a fixed epoch (periods are absolute, not per-user), so
    * offset 0 is the cohort period itself and the diagonal equals the
    * cohort size. The retention-curve input every growth dashboard plots.
    *
    * SCALE: first-seen is one user-keyed min aggregation; activity
    * periods are a user-keyed distinct (map-side combinable); the join
    * shares the user partitioning with both aggregates, so the matrix
    * build re-shuffles nothing. Output is cohort x offset — tiny. */
  def cohortRetention(events: DataFrame, periodNs: Long,
      userCol: String = "user_id", tsCol: String = "ts"): DataFrame = {
    // integral div — `/` on longs is double division (ns > 2^53)
    val period = expr(s"cast($tsCol as bigint) div ${periodNs}L")
    val first = events.groupBy(col(userCol).as("u"))
      .agg(min(period).as("cohort"))
    val active = events.select(col(userCol).as("u"), period.as("p")).distinct()
    first.join(active, Seq("u"))
      .groupBy(col("cohort"), (col("p") - col("cohort")).as("wk_offset"))
      .agg(count(lit(1)).cast("long").as("users"))
  }

  /** Exponentially time-decayed counts per key: each event contributes
    * 2^(-(T_max - t)/halfLife), so a key's score is its recency-weighted
    * popularity (an event a half-life old counts half). The reference
    * time is the corpus max — deterministic, so re-runs agree (pass a
    * wall clock only when you accept non-reproducible output).
    *
    * SCALE: one map-side-combinable groupBy plus a single-row max
    * broadcast; the decay term is pure scan-stage arithmetic. Nanosecond
    * diffs stay exact in double (corpus spans << 2^53 ns); the pow
    * libm last-ulp drift across engines is absorbed by the caller's
    * rounding. */
  def decayedCounts(events: DataFrame, halfLifeNs: Double,
      keyCol: String = "event_type", tsCol: String = "ts"): DataFrame = {
    val tmax = events.agg(max(col(tsCol)).as("tmax"))
    events.join(broadcast(tmax))
      .groupBy(col(keyCol))
      .agg(count(lit(1)).cast("long").as("n"),
        sum(pow(lit(2.0),
          -((col("tmax") - col(tsCol)).cast("double") / halfLifeNs)))
          .as("decayed"))
  }

  /** First-order Markov transition matrix over each user's event-type
    * sequence: P(next | current) estimated from all adjacent pairs,
    * ordered per user by (ts, seq). The behavioral-model primitive
    * (next-action prediction, anomalous-flow detection, session
    * simulation seeds).
    *
    * SCALE: one lag window over the per-user partitioning (the
    * [[scdType2]] shape) into one map-side-combined (from, to) count;
    * probabilities are exact integer ratios computed at the
    * |types|²-sized output, via one broadcast-sized per-from total. */
  def transitionMatrix(events: DataFrame, userCol: String = "user_id",
      typeCol: String = "event_type", tsCol: String = "ts",
      seqCol: String = "event_id"): DataFrame = {
    val byUser = Window.partitionBy(userCol).orderBy(col(tsCol), col(seqCol))
    val pairs = events
      .withColumn("from_type", lag(col(typeCol), 1).over(byUser))
      .where(col("from_type").isNotNull)
      .groupBy(col("from_type"), col(typeCol).as("to_type"))
      .agg(count(lit(1)).as("n"))
    val totals = pairs.groupBy("from_type").agg(sum("n").as("tot"))
    pairs.join(broadcast(totals), Seq("from_type"))
      .select(col("from_type"), col("to_type"), col("n"),
        (round(col("n").cast("double") / col("tot").cast("double") *
          1000000.0) / 1000000.0).as("p"))
  }

  /** Two-proportion conversion z-test between experiment variants: per
    * variant the distinct exposed users and distinct converting users,
    * then the pooled-proportion z statistic — the readout every A/B
    * dashboard prints. Counts are exact distincts; the z composition is
    * a fixed chain of IEEE ops (one sqrt), engine-identical before the
    * display rounding.
    *
    * SCALE: two distinct-aggregations keyed by variant (map-side
    * combinable via partial distinct), output is |variants| rows joined
    * at model size. */
  def abConversion(events: DataFrame, variantCol: Column,
      convertPred: Column, userCol: String = "user_id"): DataFrame = {
    val e = events.select(variantCol.as("variant"), col(userCol).as("u"),
      convertPred.as("cv"))
    val exposed = e.groupBy("variant").agg(countDistinct(col("u")).as("n"))
    val conv = e.where(col("cv"))
      .groupBy("variant").agg(countDistinct(col("u")).as("k"))
    exposed.join(conv, Seq("variant"), "left")
      .select(col("variant"), col("n"),
        coalesce(col("k"), lit(0L)).as("k"),
        (round(coalesce(col("k"), lit(0L)).cast("double") /
          col("n").cast("double") * 1000000.0) / 1000000.0).as("rate"))
  }

  /** Wilson score interval (95%, z = 1.96) for each [[abConversion]]
    * variant's conversion rate — the small-sample-safe CI the naive
    * normal interval gets wrong near 0/1. One fixed IEEE chain per
    * variant row over exact distinct counts:
    * (p̂ + z²/2n ± z·√(p̂(1−p̂)/n + z²/4n²)) / (1 + z²/n). */
  def wilsonIntervals(rates: DataFrame, z: Double = 1.96): DataFrame = {
    val nD = col("n").cast("double")
    val p = col("k").cast("double") / nD
    val z2 = lit(z * z)
    val denom = lit(1.0) + z2 / nD
    val center = p + z2 / (lit(2.0) * nD)
    val spread = lit(z) * sqrt(p * (lit(1.0) - p) / nD +
      z2 / (lit(4.0) * nD * nD))
    rates.select(col("variant"), col("n"), col("k"),
      (round(p * 1000000.0) / 1000000.0).as("rate"),
      (round((center - spread) / denom * 1000000.0) / 1000000.0).as("lo95"),
      (round((center + spread) / denom * 1000000.0) / 1000000.0).as("hi95"))
      .orderBy("variant")
  }

  /** The z statistic for exactly two variants of [[abConversion]]
    * output (a one-row model-sized fold): z = (p₀ − p₁) /
    * sqrt(p̂(1−p̂)(1/n₀ + 1/n₁)) with p̂ the pooled proportion. A
    * degenerate experiment (pooled rate exactly 0 or 1 — the variance
    * term vanishes) yields z = null, never a division error. */
  def abZScore(rates: DataFrame): DataFrame = {
    // domain-bounded window: one row per experiment VARIANT (2-3 rows)
    val w = Window.orderBy("variant")
    val two = rates
      .withColumn("rn", row_number().over(w))
      .agg(
        max(when(col("rn") === 1, col("k"))).as("k0"),
        max(when(col("rn") === 1, col("n"))).as("n0"),
        max(when(col("rn") === 2, col("k"))).as("k1"),
        max(when(col("rn") === 2, col("n"))).as("n1"))
    two.select(col("k0"), col("n0"), col("k1"), col("n1"),
      when(col("k0") + col("k1") > 0 &&
          col("k0") + col("k1") < col("n0") + col("n1"),
        round({
          val p0 = col("k0").cast("double") / col("n0").cast("double")
          val p1 = col("k1").cast("double") / col("n1").cast("double")
          val pp = (col("k0") + col("k1")).cast("double") /
            (col("n0") + col("n1")).cast("double")
          (p0 - p1) / sqrt(pp * (lit(1.0) - pp) *
            (lit(1.0) / col("n0").cast("double") +
              lit(1.0) / col("n1").cast("double")))
        } * 10000.0) / 10000.0).as("z"))
  }

  /** Session-level fact table from the raw event stream: gap-based
    * sessionization (q18's lag+cumsum chain) aggregated to one row per
    * (user, session) — start/end, depth, and a conversion flag. The
    * intermediate every session-scoped analysis (duration
    * distributions, conversion attribution, funnel entry) joins
    * against, here materialized as an operator instead of re-deriving
    * the window chain per consumer.
    *
    * SCALE: both windows and the final aggregation share ONE hash
    * partitioning by user; nothing else shuffles. */
  def sessionStats(events: DataFrame, gapNs: Long,
      convertType: String = "purchase", userCol: String = "user_id",
      typeCol: String = "event_type", tsCol: String = "ts",
      seqCol: String = "event_id"): DataFrame = {
    val byUser = Window.partitionBy(userCol).orderBy(col(tsCol), col(seqCol))
    events
      .withColumn("_prev_ts", lag(col(tsCol), 1).over(byUser))
      .withColumn("_new_sess",
        when(col("_prev_ts").isNull ||
          (col(tsCol) - col("_prev_ts")) > gapNs, 1L).otherwise(0L))
      .withColumn("sess_id", sum(col("_new_sess")).over(byUser))
      .groupBy(col(userCol), col("sess_id"))
      .agg(min(col(tsCol)).as("start_ns"), max(col(tsCol)).as("end_ns"),
        count(lit(1)).as("n_events"),
        (sum(when(col(typeCol) === convertType, 1L).otherwise(0L)) > 0)
          .as("converted"))
  }

  /** Top-k most common session PATHS (the ordered event-type sequence
    * within a session) — the flow-mining staple behind "how do users
    * actually reach checkout". Sessionization reuses [[sessionStats]]'s
    * gap chain; the path string is an order-stable fold: collect the
    * session's (ts, seq, type) structs, array_sort (lexicographic on
    * the struct = the (ts, seq) event order), project the types, join
    * with a separator — deterministic under any partitioning, no
    * order-sensitive string agg.
    *
    * SCALE: the collect_list is SESSION-bounded (the natural unit — a
    * session is human-sized), the path relation aggregates map-side,
    * and the top-k is TakeOrderedAndProject. */
  def topSessionPaths(events: DataFrame, gapNs: Long, k: Int,
      userCol: String = "user_id", typeCol: String = "event_type",
      tsCol: String = "ts", seqCol: String = "event_id"): DataFrame = {
    val byUser = Window.partitionBy(userCol).orderBy(col(tsCol), col(seqCol))
    val sess = events
      .withColumn("_prev_ts", lag(col(tsCol), 1).over(byUser))
      .withColumn("_new_sess",
        when(col("_prev_ts").isNull ||
          (col(tsCol) - col("_prev_ts")) > gapNs, 1L).otherwise(0L))
      .withColumn("sess_id", sum(col("_new_sess")).over(byUser))
    sess.groupBy(col(userCol), col("sess_id"))
      .agg(array_join(transform(
        array_sort(collect_list(struct(col(tsCol).as("t"),
          col(seqCol).as("s"), col(typeCol).as("e")))),
        x => x.getField("e")), ">").as("path"))
      .groupBy("path").agg(count(lit(1)).as("n"))
      .orderBy(col("n").desc, col("path")).limit(k)
  }

  /** RFM (recency / frequency / monetary) quartile segmentation — the
    * classic customer-value cut. Per-user metrics reduce in one
    * aggregation; the quartile BOUNDARIES come from nearest-rank
    * selection ([[Profiling.rankPercentiles]]) over the user dimension
    * and re-enter as a single-row broadcast, so the assignment itself
    * is a scan-speed comparison — no global re-rank of the dimension
    * to label it. Monetary sums are rounded to 1e-6 BEFORE the
    * quantile/bucket comparisons so partial-aggregation accumulation
    * order can never flip a boundary tie cross-engine.
    *
    * Quartile rule: value ≤ p25 → 1, ≤ p50 → 2, ≤ p75 → 3, else 4
    * (boundaries are corpus values — exact comparisons). */
  def rfmSegments(events: DataFrame, convertType: String = "purchase",
      userCol: String = "user_id", typeCol: String = "event_type",
      tsCol: String = "ts", valueCol: String = "value"): DataFrame = {
    val perUser = events.groupBy(col(userCol).as("user_id"))
      .agg(max(col(tsCol)).as("r"), count(lit(1)).as("f"),
        (round(sum(when(col(typeCol) === convertType, col(valueCol))
          .otherwise(lit(0.0))) * 1000000.0) / 1000000.0).as("m"))
      .localCheckpoint() // feeds three boundary windows + the assignment
    def bounds(c: String, pfx: String) =
      broadcast(Profiling.rankPercentiles(
        perUser.select(lit(1).as("g"), col(c)), "g", c, Seq(0.25, 0.5, 0.75))
        .select(col("p25").as(s"${pfx}25"), col("p50").as(s"${pfx}50"),
          col("p75").as(s"${pfx}75")))
    def quart(x: Column, pfx: String): Column =
      when(x <= col(s"${pfx}25"), 1L).when(x <= col(s"${pfx}50"), 2L)
        .when(x <= col(s"${pfx}75"), 3L).otherwise(4L)
    perUser
      .join(bounds("r", "r")).join(bounds("f", "f")).join(bounds("m", "m"))
      .select(col("user_id"), col("f"), col("m"),
        quart(col("r"), "r").as("rq"), quart(col("f"), "f").as("fq"),
        quart(col("m"), "m").as("mq"))
  }

  /** Slowly-changing-dimension Type-2 build from a change log: collapse
    * each key's consecutive runs of the same attribute value into
    * validity intervals `[valid_from, valid_to)` with a version number
    * and an is_current flag — the warehouse-dimension shape every
    * downstream as-of join (q19) consumes. Run starts are rows whose
    * attribute differs from the previous row's (per key, ordered by
    * (ts, seq) — seq breaks timestamp ties deterministically);
    * valid_to is the NEXT run's valid_from, null while current.
    *
    * SCALE: two window passes over the same (key, ts, seq) ordering —
    * one shuffle by key, then both lag() and the post-filter lead()/
    * row_number() reuse that partitioning (the second window sees
    * run-start rows only, a strict subset). State per key is one row;
    * no self-join, no collect. At 100 TB the only cost is the one
    * hash-partition-by-key exchange any per-key history pass needs. */
  def scdType2(changes: DataFrame, keyCol: String, attrCol: String,
      tsCol: String, seqCol: String): DataFrame = {
    val byKey = Window.partitionBy(keyCol).orderBy(col(tsCol), col(seqCol))
    val runs = changes
      .withColumn("_prev", lag(col(attrCol), 1).over(byKey))
      .where(col("_prev").isNull || col("_prev") =!= col(attrCol))
    runs
      .withColumn("version", row_number().over(byKey).cast("long"))
      .withColumn("valid_to", lead(col(tsCol), 1).over(byKey))
      .select(col(keyCol), col("version"), col(attrCol),
        col(tsCol).as("valid_from"), col("valid_to"),
        col("valid_to").isNull.as("is_current"))
  }

  /** Pointwise-mutual-information contingency between two categorical
    * columns: every (x, y) cell with its joint count, marginals, and
    * PMI term p(x,y)·ln(p(x,y)/(p(x)p(y))) — summing the last column IS
    * the mutual information, but the per-cell table is the useful
    * artifact (it names WHICH combinations carry the dependence).
    *
    * Determinism: all counts are exact integers from one pass; the only
    * float work is the final per-cell expression, composed identically
    * on any engine (÷ and × are IEEE-exact; ln may differ in the last
    * ulp across libms, absorbed by the 1e-6 display rounding).
    *
    * SCALE: three map-side-combined aggregations over one projection;
    * the marginal tables and the grand total re-enter as broadcasts
    * (domain-sized — categorical by assumption). Output is one row per
    * observed cell. */
  def pmiContingency(df: DataFrame, xCol: Column, yCol: Column): DataFrame = {
    val base = df.select(xCol.as("x"), yCol.as("y"))
    val cells = base.groupBy("x", "y").agg(count(lit(1)).as("nxy"))
    val mx = base.groupBy("x").agg(count(lit(1)).as("nx"))
    val my = base.groupBy("y").agg(count(lit(1)).as("ny"))
    val tot = base.agg(count(lit(1)).as("n"))
    val (dxy, dx, dy, dn) = (col("nxy").cast("double"),
      col("nx").cast("double"), col("ny").cast("double"),
      col("n").cast("double"))
    cells.join(broadcast(mx), "x").join(broadcast(my), "y")
      .join(broadcast(tot))
      .select(col("x"), col("y"), col("nxy"), col("nx"), col("ny"),
        (round(dxy / dn * log(dxy * dn / (dx * dy)) * 1000000.0)
          / 1000000.0).as("mi_term"))
      .orderBy("x", "y")
  }

  /** Autocorrelation of the dense daily event-count series at lags
    * 1..`maxLag` — the seasonality/health scalar per lag (lag-7 spikes
    * = weekly cycle; lag-1 collapse = bursty ingest). The series is
    * densified over [min_day, max_day] (absent days count 0) so gaps
    * don't silently splice distant days together.
    *
    * r_k is the Pearson correlation of (x_t, x_{t+k}) computed from
    * exact integer sufficient sums: counts are longs, their products
    * accumulate in decimal(38,0) (a day at 100 TB scale can hold ~10¹²
    * events; the square is ~10²⁴, far past a long), and the closed
    * form touches doubles only at the single-output-row fold — sqrt is
    * IEEE-correctly-rounded, so both engines emit identical bits
    * before the display rounding.
    *
    * SCALE: one corpus aggregation to the day-sized count table; the
    * densify + lag self-join + per-lag fold all run on that table
    * (days × maxLag rows). Driver state: the 2-value bounds row. */
  /** Dense daily event counts over [min_day, max_day] — absent days
    * count 0. One corpus aggregation to a day-sized table; the densify
    * joins against the exploded bounds row. */
  /** Public alias of [[denseDailyCounts]] for query-layer compositions
    * (q296 regression diagnostics). */
  def dailyCountsDense(events: DataFrame,
      dayNs: Long = 86400L * 1000000000L): DataFrame =
    denseDailyCounts(events, dayNs)

  private def denseDailyCounts(events: DataFrame, dayNs: Long): DataFrame = {
    val counts = events
      .select(expr(s"ts div $dayNs").as("day"))
      .groupBy("day").agg(count(lit(1)).as("c"))
    val bounds = counts.agg(min("day").as("mn"), max("day").as("mx"))
    bounds
      .select(explode(sequence(col("mn"), col("mx"))).as("day"))
      .join(counts, Seq("day"), "left")
      .select(col("day"), coalesce(col("c"), lit(0L)).as("c"))
  }

  def dailyAcf(events: DataFrame, maxLag: Int = 7,
      dayNs: Long = 86400L * 1000000000L): DataFrame = {
    val dense = denseDailyCounts(events, dayNs)
    val dec = org.apache.spark.sql.types.DecimalType(38, 0)
    val lagged = dense
      .select(col("day"), col("c"),
        explode(sequence(lit(1), lit(maxLag))).as("lag"))
      .join(dense.select(col("day").as("bday"), col("c").as("cb")),
        col("bday") === col("day") + col("lag"))
    val agg = lagged.groupBy("lag").agg(
      count(lit(1)).cast(dec).as("n"),
      sum(col("c")).cast(dec).as("sx"), sum(col("cb")).cast(dec).as("sy"),
      sum(col("c").cast(dec) * col("c").cast(dec)).as("sxx"),
      sum(col("cb").cast(dec) * col("cb").cast(dec)).as("syy"),
      sum(col("c").cast(dec) * col("cb").cast(dec)).as("sxy"))
    val num = (col("n") * col("sxy") - col("sx") * col("sy")).cast("double")
    val vx = (col("n") * col("sxx") - col("sx") * col("sx")).cast("double")
    val vy = (col("n") * col("syy") - col("sy") * col("sy")).cast("double")
    agg.select(col("lag").cast("long").as("lag"),
      col("n").cast("long").as("n_pairs"),
      when(vx > 0 && vy > 0,
        round(num / sqrt(vx * vy) * 1000000.0) / 1000000.0).as("acf"))
      .orderBy("lag")
  }

  /** CUSUM changepoint over the dense daily event-count series: the
    * day t maximizing |T·cum_t − t·S| — the cross-scaled form of the
    * classic max |Σᵢ≤t (cᵢ − mean)| (multiply through by T), kept in
    * EXACT integers (decimal(38,0): cum ~ corpus count, T ~ days —
    * the product wraps a long at ~10¹⁴ events) so the argmax is
    * engine-independent. Reports the split day with the before/after
    * means — "ingest volume changed HERE".
    *
    * SCALE: one corpus pass to the day-sized dense series; the
    * cumulative window and argmax run on that domain-sized table
    * (single-partition by construction, documented). */
  def cusumChangepoint(events: DataFrame,
      dayNs: Long = 86400L * 1000000000L): DataFrame = {
    val dec = org.apache.spark.sql.types.DecimalType(38, 0)
    val dense = denseDailyCounts(events, dayNs)
    val w = Window.orderBy("day")
    val tot = dense.agg(sum(col("c")).cast(dec).as("s"),
      count(lit(1)).cast(dec).as("t_days"))
    val cum = dense
      .withColumn("t", row_number().over(w).cast("long"))
      .withColumn("cum", sum(col("c")).over(
        w.rowsBetween(Window.unboundedPreceding, 0)))
      .join(broadcast(tot))
      .where(col("t").cast(dec) < col("t_days"))
      .withColumn("stat", abs(col("t_days") * col("cum").cast(dec) -
        col("t").cast(dec) * col("s")))
    cum.orderBy(col("stat").desc, col("t")).limit(1)
      .select(col("day").as("split_day"), col("t"),
        (round(col("cum").cast("double") / col("t").cast("double")
          * 1000000.0) / 1000000.0).as("mean_before"),
        (round((col("s") - col("cum").cast(dec)).cast("double") /
          (col("t_days") - col("t").cast(dec)).cast("double")
          * 1000000.0) / 1000000.0).as("mean_after"),
        (round(col("stat").cast("double") / col("t_days").cast("double")
          * 1000000.0) / 1000000.0).as("cusum"))
  }

  /** Frequent contiguous event-type trigrams per user (the SPADE-lite
    * sequential-pattern cut): every (t, t+1, t+2) run in the per-user
    * (ts, event_id) total order, ranked by distinct-user reach then raw
    * occurrences — "what do users actually DO three steps in a row".
    * SCALE: one user-keyed window pass (two leads), one pattern-keyed
    * aggregation with map-side combine; top-k via TakeOrdered. */
  def sequentialPatterns(events: DataFrame, topK: Int = 15): DataFrame = {
    val byUser = Window.partitionBy("user_id")
      .orderBy(col("ts"), col("event_id"))
    events
      .withColumn("t1", lead(col("event_type"), 1).over(byUser))
      .withColumn("t2", lead(col("event_type"), 2).over(byUser))
      .where(col("t1").isNotNull && col("t2").isNotNull)
      .select(col("user_id"), concat(col("event_type"), lit(">"),
        col("t1"), lit(">"), col("t2")).as("pattern"))
      .groupBy("pattern")
      .agg(count(lit(1)).cast("long").as("n_occurrences"),
        countDistinct("user_id").cast("long").as("n_users"))
      .orderBy(col("n_users").desc, col("n_occurrences").desc,
        col("pattern"))
      .limit(topK)
  }

  /** Data-driven Shapley channel attribution (Shapley 1953 applied to
    * the marketing coalition game): per user, the SET of touched
    * non-conversion channels (a 4-bit mask) and a converted flag; the
    * game value v(S) = conversion rate of users whose touch set ⊆ S;
    * each channel's credit is the exact Shapley sum
    * Σ_{S∌c} |S|!(C−|S|−1)!/C! · (v(S∪c) − v(S)). Unlike last-touch
    * (q222), a channel only earns credit for conversions it MARGINALLY
    * enables across every coalition.
    *
    * Determinism: masks and subset-cumulative counts are exact
    * integers; v is an exact-integer ratio; factorial weights are
    * literal fraction chains shared with the oracle. Empty-denominator
    * coalitions value 0 by contract.
    *
    * SCALE: one user-keyed aggregation to the ≤2^C-row mask table;
    * everything after runs on the 2^C lattice (model-sized — C is the
    * channel count, never the data). */
  def shapleyAttribution(events: DataFrame,
      convertType: String = "purchase"): DataFrame = {
    val spark = events.sparkSession
    val channels = Seq("click", "error", "signup", "view")
    val full = (1 << channels.length) - 1
    val bits = channels.zipWithIndex.map { case (c, i) =>
      max(when(col("event_type") === c, 1L << i).otherwise(0L)).as(s"b$i")
    }
    val perUser = events.groupBy("user_id")
      .agg(bits.head, bits.tail ++ Seq(max(when(
        col("event_type") === convertType, 1L).otherwise(0L)).as("conv")): _*)
      .select(channels.indices.map(i => col(s"b$i")).reduce(_ + _).as("m"),
        col("conv"))
    val grp = perUser.groupBy("m")
      .agg(count(lit(1)).as("n"), sum("conv").as("nc"))
    val lattice = spark.range(1 << channels.length).select(col("id").as("s"))
    val v = lattice.join(grp,
        (col("m").bitwiseAND(lit(full.toLong) - col("s"))) === 0L, "left")
      .groupBy("s")
      .agg(sum(coalesce(col("n"), lit(0L))).as("vn"),
        sum(coalesce(col("nc"), lit(0L))).as("vc"))
      .select(col("s"), when(col("vn") > 0,
        col("vc").cast("double") / col("vn").cast("double"))
        .otherwise(0.0).as("v"))
      .localCheckpoint() // probed at S and S∪{c}
    val terms = spark.range(channels.length).select(col("id").as("c"))
      .join(lattice.withColumnRenamed("s", "s0"))
      .where(col("s0").bitwiseAND(expr("shiftleft(1L, CAST(c AS INT))")) === 0L)
      .join(v.select(col("s").as("s0"), col("v").as("v0")), Seq("s0"))
      .join(v.select(col("s").as("s1"), col("v").as("v1")),
        col("s1") === col("s0") + expr("shiftleft(1L, CAST(c AS INT))"))
      .select(col("c"),
        (expr("CASE bit_count(s0) WHEN 0 THEN 6.0 WHEN 1 THEN 2.0 " +
          "WHEN 2 THEN 2.0 ELSE 6.0 END") / lit(24.0) *
          (col("v1") - col("v0"))).as("t"))
    val out = terms.groupBy("c")
      .agg((round(sum("t") * 1000000.0) / 1000000.0).as("shapley"))
      .select(expr("CASE c WHEN 0 THEN 'click' WHEN 1 THEN 'error' " +
        "WHEN 2 THEN 'signup' ELSE 'view' END").as("channel"),
        col("shapley"))
      .orderBy("channel").localCheckpoint()
    IterUtils.unpersistCheckpoint(v)
    out
  }

  /** Per-user covered active time under `holdNs`-long activity
    * intervals: the length of the UNION of [ts, ts+hold) — the classic
    * merge-overlaps sweep as one user-keyed window (running max of
    * interval ends), in exact integer nanoseconds.
    * SCALE: one user-keyed window pass; output user-sized. */
  def coveredTime(events: DataFrame,
      holdNs: Long = 300L * 1000000000L): DataFrame = {
    val byUser = Window.partitionBy("user_id")
      .orderBy(col("ts"), col("event_id"))
      .rowsBetween(Window.unboundedPreceding, -1)
    events
      .withColumn("prevEnd", max(col("ts") + holdNs).over(byUser))
      .select(col("user_id"),
        greatest(lit(0L), col("ts") + holdNs -
          greatest(col("ts"), coalesce(col("prevEnd"), col("ts"))))
          .as("add"))
      .groupBy("user_id")
      .agg(count(lit(1)).cast("long").as("n_events"),
        (round(sum(col("add")).cast("double") / 1000000000.0 * 1000.0)
          / 1000.0).as("covered_s"))
  }

  /** Weekly seasonality strength: one-way ANOVA of the dense daily
    * counts across the 7 day-of-week classes ([[Stats.oneWayAnova]]) —
    * η² IS the fraction of daily-volume variance the weekly cycle
    * explains (the variance-decomposition definition of seasonality
    * strength), and F answers whether the cycle is real at all. Day
    * classes come from day-number mod 7 — calendar-free, exact.
    * SCALE: one corpus pass to the day-sized series, then group math. */
  def seasonalityStrength(events: DataFrame,
      dayNs: Long = 86400L * 1000000000L): DataFrame =
    Stats.oneWayAnova(denseDailyCounts(events, dayNs),
      pmod(col("day"), lit(7L)), col("c"))

  /** CUPED variance reduction (Deng et al. WSDM 2013): split the window
    * at its midpoint day, take each user's pre-period and post-period
    * value totals (exact integer cents), and compute θ = cov(X,Y)/var(X)
    * with the achieved variance reduction var(Y−θX)/var(Y) = 1−ρ² — how
    * much experiment sensitivity the pre-period covariate buys. Users
    * absent in a period contribute 0 (the standard all-exposed frame).
    *
    * Determinism: the split day derives from exact min/max day integers;
    * all five moments are exact decimal sums of cent-integers; θ/ρ²
    * compose in one fixed double chain on the single output row.
    *
    * SCALE: one user-keyed aggregation (map-side combined) to the
    * user-sized (x, y) table, one moment fold, 1-row output. */
  def cuped(events: DataFrame, valueCol: String = "value",
      dayNs: Long = 86400L * 1000000000L): DataFrame = {
    val dec = org.apache.spark.sql.types.DecimalType(38, 0)
    val dayed = events.select(col("user_id"),
      expr(s"ts div $dayNs").as("day"),
      round(col(valueCol).cast("double") * 100.0).cast("long").as("cents"))
    val bounds = dayed.agg(min("day").as("mn"), max("day").as("mx"))
    val split = dayed.join(broadcast(bounds))
      .select(col("user_id"), col("cents"),
        (col("day") < expr("(mn + mx + 1) div 2")).as("pre"))
    val perUser = split.groupBy("user_id")
      .agg(sum(when(col("pre"), col("cents")).otherwise(0L)).as("x"),
        sum(when(!col("pre"), col("cents")).otherwise(0L)).as("y"))
    val m = perUser.agg(count(lit(1)).cast(dec).as("n"),
      sum(col("x")).cast(dec).as("sx"), sum(col("y")).cast(dec).as("sy"),
      sum(col("x").cast(dec) * col("x").cast(dec)).as("sxx"),
      sum(col("y").cast(dec) * col("y").cast(dec)).as("syy"),
      sum(col("x").cast(dec) * col("y").cast(dec)).as("sxy"))
    val nD = col("n").cast("double")
    val varX = (col("sxx").cast("double") -
      col("sx").cast("double") * col("sx").cast("double") / nD) / nD
    val varY = (col("syy").cast("double") -
      col("sy").cast("double") * col("sy").cast("double") / nD) / nD
    val covXY = (col("sxy").cast("double") -
      col("sx").cast("double") * col("sy").cast("double") / nD) / nD
    val theta = covXY / varX
    m.select(col("n").cast("long").as("n_users"),
      (round(theta * 1000000.0) / 1000000.0).as("theta"),
      (round(varY * 10000.0) / 10000.0).as("var_y"),
      (round((varY - covXY * covXY / varX) * 10000.0) / 10000.0)
        .as("var_adj"),
      (round(covXY * covXY / (varX * varY) * 1000000.0) / 1000000.0)
        .as("reduction"))
  }

  /** Truncated exponential smoothing of the dense daily series with the
    * DYADIC kernel α=1/2: ewma_t = Σ_{j=0..K-1} 2^{-(j+1)} c_{t-j},
    * normalized by the truncated weight mass (1 − 2^{-K}), plus the
    * one-step-ahead forecast error |c_t − ewma_{t-1}|. Emits only days
    * with a full K-day history (the [[rollingZScore]] full-baseline
    * convention).
    *
    * Exactness: α=1/2 makes every weight a power of two, so the kernel
    * scaled by 2^K is the INTEGER vector (2^{K-1}..2^0) and the scaled
    * convolution Σ c_{t-j}·2^{K-1-j} is an exact decimal(38,0) sum under
    * any accumulation order — no engine-dependent float pow, no window
    * running-sum order sensitivity. One decimal→double conversion (IEEE
    * correctly rounded, identical in both engines) precedes the display
    * rounding. A non-dyadic α would put pow() ulps inside the sum; this
    * is the deterministic member of the EWMA family by construction.
    *
    * SCALE: one corpus pass to the day-sized dense series; the K-lag
    * explode+join convolution runs on days×K rows ([[dailyAcf]] shape).
    * No driver state beyond the densify bounds row. */
  def ewmaSmooth(events: DataFrame, k: Int = 20,
      dayNs: Long = 86400L * 1000000000L): DataFrame = {
    require(k >= 1 && k <= 60, "dyadic kernel needs 1 <= k <= 60 lags")
    val dec = org.apache.spark.sql.types.DecimalType(38, 0)
    val dense = denseDailyCounts(events, dayNs).localCheckpoint()
    val mass = (1L << k) - 1L // Σ_{j<k} 2^{k-1-j}; normalizer × 2^{-k}
    val conv = dense
      .select(col("day"), explode(sequence(lit(0), lit(k - 1))).as("j"))
      .join(dense.select(col("day").as("lday"), col("c").as("lc")),
        col("lday") === col("day") - col("j"))
      .groupBy("day")
      .agg(count(lit(1)).as("m"),
        sum(col("lc").cast(dec) *
          expr(s"shiftleft(1L, ${k - 1} - j)").cast(dec)).as("scaled"))
      .where(col("m") === k) // full history only
      .select(col("day"),
        (col("scaled").cast("double") / mass.toDouble).as("ewma"))
    dense.join(conv.select((col("day") + 1).as("day"),
        col("ewma").as("prev_ewma")), Seq("day"))
      .join(conv, Seq("day"))
      .select(col("day"), col("c"),
        (round(col("ewma") * 1000000.0) / 1000000.0).as("ewma"),
        (round(abs(col("c").cast("double") - col("prev_ewma")) * 1000000.0)
          / 1000000.0).as("forecast_abs_err"))
  }

  /** Trailing-window z-score anomalies over the dense daily series:
    * each day scored against the mean/std of the PRECEDING `window`
    * days — the self-calibrating volume alarm (a fixed threshold goes
    * stale; a trailing baseline tracks drift). Emits only days with a
    * full baseline window.
    *
    * Determinism: the frame sums Σc and Σc² are exact integers
    * (decimal(38,0) — day counts square past a long at warehouse
    * scale); mean/std/z compose in one fixed IEEE chain per row.
    *
    * SCALE: day-domain-sized window work after one corpus pass. */
  def rollingZScore(events: DataFrame, window: Int = 14,
      dayNs: Long = 86400L * 1000000000L): DataFrame = {
    val dec = org.apache.spark.sql.types.DecimalType(38, 0)
    val dense = denseDailyCounts(events, dayNs)
    val w = Window.orderBy("day").rowsBetween(-window, -1)
    val base = dense
      .withColumn("k", count(lit(1)).over(w))
      .withColumn("s1", sum(col("c").cast(dec)).over(w))
      .withColumn("s2", sum(col("c").cast(dec) * col("c").cast(dec)).over(w))
      .where(col("k") === window)
    val kD = col("k").cast("double")
    val mean = col("s1").cast("double") / kD
    val varE = (col("s2").cast("double") - col("s1").cast("double") *
      col("s1").cast("double") / kD) / kD
    base.select(col("day"), col("c"),
      (round(mean * 1000000.0) / 1000000.0).as("baseline_mean"),
      when(varE > 0, round((col("c").cast("double") - mean) / sqrt(varE)
        * 1000000.0) / 1000000.0).as("z"))
      .orderBy("day")
  }

  /** Exponential fit + KS goodness for per-user inter-arrival times:
    * MLE rate λ = n/Σdt over integer-second gaps, then the exact KS
    * distance between the empirical gap distribution and Exp(λ) — "is
    * arrival really Poisson, and where does it deviate most" (a heavy
    * tail at the argmax gap = sessionization signature, not noise).
    *
    * Determinism: gaps/counts exact integers; λ is one division; the
    * deviation is computed per DISTINCT gap value and argmaxed on the
    * value ROUNDED to 1e-9 (a last-ulp libm difference in exp() cannot
    * reorder engines) with the gap tiebreak.
    *
    * SCALE: one user-keyed lag pass; everything after runs on the
    * distinct-gap domain. Output: 1 row. */
  def interArrivalExpFit(events: DataFrame,
      secNs: Long = 1000000000L): DataFrame = {
    val byUser = Window.partitionBy("user_id")
      .orderBy(col("ts"), col("event_id"))
    val dt = events
      .withColumn("_prev", lag(col("ts"), 1).over(byUser))
      .where(col("_prev").isNotNull)
      .select(expr(s"(ts - _prev) div $secNs").as("v"))
    val tot = dt.agg(count(lit(1)).as("n"), sum(col("v")).as("s"))
    val byV = dt.groupBy("v").agg(count(lit(1)).as("c"))
    val lambda = col("n").cast("double") / col("s").cast("double")
    val diff = abs(col("cum").cast("double") / col("n").cast("double") -
      (lit(1.0) - exp(-lambda * col("v").cast("double"))))
    // gap-seconds is a VALUE domain, not a calendar one — at 100 TB the
    // distinct-gap table can reach 10^8 rows, so the ECDF cumulative
    // runs as the shared two-phase prefix sum, never a global window
    graft.operators.DistributedRank.prefixSum(byV, Nil, Seq(col("v")),
        Seq("c" -> "cum"), inclusive = true)
      .join(broadcast(tot))
      .withColumn("d9", round(diff * 1000000000.0) / 1000000000.0)
      .orderBy(col("d9").desc, col("v"))
      .limit(1)
      .select(col("n"),
        (round(col("s").cast("double") / col("n").cast("double")
          * 1000000.0) / 1000000.0).as("mean_gap_s"),
        (round(lambda * 1000000000.0) / 1000000000.0).as("lambda"),
        col("v").as("at_gap_s"),
        (round(col("d9") * 1000000.0) / 1000000.0).as("ks_d"))
  }

  /** Stationary distribution of the [[transitionMatrix]] Markov chain
    * by quantized power iteration: π₀ uniform, each round
    * π'[j] = round₉(Σᵢ π[i]·P[i][j]) in 1e-9 units — the quantize-
    * before-accumulate pattern (the logreg trainer's) that makes every
    * round's vector an exact integer tuple on any engine, so 30 rounds
    * stay bit-identical while the float drift per round (~1e-16) sits
    * five orders below the rounding threshold. Answers "where does a
    * user's session settle" — the long-run state mix.
    *
    * SCALE: the transition counts collect at MODEL size (|types|² —
    * the same contract as the PCA moments); iteration is driver-side
    * on that model; output is |types| rows. */
  def stationaryDistribution(events: DataFrame, rounds: Int = 30): DataFrame = {
    val spark = events.sparkSession
    import spark.implicits._
    val cells = transitionMatrix(events)
      .select(col("from_type"), col("to_type"), col("n"))
      .collect().map(r => (r.getString(0), r.getString(1), r.getLong(2)))
    val states = (cells.map(_._1) ++ cells.map(_._2)).distinct.sorted
    val idx = states.zipWithIndex.toMap
    val k = states.length
    val cnt = Array.ofDim[Long](k, k)
    cells.foreach { case (f, t, n) => cnt(idx(f))(idx(t)) = n }
    val rowTot = cnt.map(_.sum)
    var pi = Array.fill(k)(math.round(1e9 / k))
    for (_ <- 1 to rounds) {
      val next = Array.ofDim[Long](k)
      var j = 0
      while (j < k) {
        var acc = 0.0
        var i = 0
        while (i < k) { // ascending-i fold; drift absorbed by round₉
          if (rowTot(i) > 0)
            acc += (pi(i) / 1e9) * (cnt(i)(j).toDouble / rowTot(i).toDouble)
          i += 1
        }
        next(j) = math.round(acc * 1e9)
        j += 1
      }
      pi = next
    }
    states.zip(pi).toSeq.toDF("state", "prob_q")
      .select(col("state"), col("prob_q"),
        (round(col("prob_q").cast("double") / lit(1000.0)) / 1000000.0)
          .as("prob"))
      .orderBy("state")
  }

  /** Expected steps to absorption — "how many more events until this
    * user purchases": treat `absorb` as the absorbing state of the
    * [[transitionMatrix]] chain and iterate the truncated-expectation
    * recurrence x'[i] = round₉(1 + Σ_{j∉absorb} P[i][j]·x[j]) from
    * x = 0 for `rounds` rounds ([[stationaryDistribution]]'s
    * quantize-per-round discipline — every round's vector is an exact
    * integer tuple, bit-identical cross-engine; the result is the
    * expected number of steps counting only absorption paths of length
    * ≤ rounds, converging geometrically from below). Also reports the
    * one-step absorption probability per transient state.
    *
    * SCALE: the same MODEL-size contract as the stationary iteration —
    * |types|² counts collect to the driver, output is |types|−1 rows. */
  def absorbingSteps(events: DataFrame, absorb: String = "purchase",
      rounds: Int = 30): DataFrame = {
    val spark = events.sparkSession
    import spark.implicits._
    val cells = transitionMatrix(events)
      .select(col("from_type"), col("to_type"), col("n"))
      .collect().map(r => (r.getString(0), r.getString(1), r.getLong(2)))
    val states = (cells.map(_._1) ++ cells.map(_._2)).distinct.sorted
    val trans = states.filterNot(_ == absorb)
    val idx = states.zipWithIndex.toMap
    val k = states.length
    val cnt = Array.ofDim[Long](k, k)
    cells.foreach { case (f, t, n) => cnt(idx(f))(idx(t)) = n }
    val rowTot = cnt.map(_.sum)
    var x = trans.map(_ => 0L).toArray
    for (_ <- 1 to rounds) {
      val next = new Array[Long](trans.length)
      var ii = 0
      while (ii < trans.length) {
        val i = idx(trans(ii))
        if (rowTot(i) == 0) {
          // dead end: never absorbs, so it contributes NOTHING to its
          // predecessors (a path entering it is not an absorption
          // path) — pinning 0 here keeps the recurrence consistent
          // with the NULL its own output row reports below
          next(ii) = 0L
        } else {
          var acc = 0.0
          var jj = 0
          while (jj < trans.length) {
            val j = idx(trans(jj))
            acc += (x(jj) / 1e9) *
              (cnt(i)(j).toDouble / rowTot(i).toDouble)
            jj += 1
          }
          next(ii) = math.round((1.0 + acc) * 1e9)
        }
        ii += 1
      }
      x = next
    }
    val ai = idx.getOrElse(absorb,
      throw new IllegalArgumentException(s"no transitions into $absorb"))
    // A transient state with NO outgoing transitions never absorbs —
    // its true expected steps is +∞, so the unconditional '+1' of the
    // recurrence must not surface as exp_steps = 1.0; report NULL
    // (p_direct stays 0.0: zero observed direct conversions).
    trans.zipWithIndex.map { case (s, ii) =>
      val i = idx(s)
      val noOut = rowTot(i) == 0
      val pd = if (!noOut) cnt(i)(ai).toDouble / rowTot(i).toDouble
        else 0.0
      (s, if (noOut) None else Some(x(ii)),
        math.round(pd * 1e6) / 1e6.toDouble)
    }.toSeq.toDF("from_type", "steps_q", "p_direct")
      .select(col("from_type"), col("steps_q"),
        (round(col("steps_q").cast("double") / 1000.0) / 1000000.0)
          .as("exp_steps"), col("p_direct"))
      .orderBy("from_type")
  }

  /** Markov removal-effect channel attribution (the standard
    * Markov-chain attribution model, Anderl et al. 2014): per-user
    * journeys truncated at the FIRST conversion map onto a chain with
    * START, one state per channel, and absorbing CONV / NULL; the
    * baseline conversion rate is the absorption probability into CONV
    * from START; a channel's removal effect is the relative drop in
    * that probability when every path through the channel is blocked
    * (its absorption value pinned to 0 — entering it contributes
    * nothing); attribution shares normalize the removal masses. The
    * absorption recurrence p[i] = P(i→CONV) + Σ_j P(i→j)·p[j] iterates
    * `rounds` rounds under the q240 quantize-per-round discipline
    * (p rounded to 1e-9 every round), so each scenario's vector is an
    * exact integer tuple bit-identical cross-engine and the oracle
    * unrolls the identical rounds per scenario. Shares are ratios of
    * EXACT quantized masses ((qb−qc)/Σ(qb−qc)) — no float accumulation
    * in the contract.
    *
    * SCALE: journey building is windows PARTITIONED BY user (bounded
    * per user) plus one (from, to) count aggregation; the chain is
    * |types|²-bounded and collects to the driver (q240's model
    * contract); the per-scenario iterations run driver-side on the
    * tiny matrix. Output: one row per channel. */
  def conversionAttribution(events: DataFrame, absorb: String = "purchase",
      rounds: Int = 15, userCol: String = "user_id",
      typeCol: String = "event_type", tsCol: String = "ts",
      seqCol: String = "event_id"): DataFrame = {
    val spark = events.sparkSession
    import spark.implicits._
    val byUser = Window.partitionBy(userCol).orderBy(col(tsCol), col(seqCol))
    val seq0 = events.select(col(userCol).as("u"),
      when(col(typeCol) === absorb, lit("CONV")).otherwise(col(typeCol))
        .as("st"),
      row_number().over(byUser).as("rn"))
    val fp = seq0.where(col("st") === "CONV")
      .groupBy("u").agg(min("rn").as("prn"))
    val kept = seq0.join(fp, Seq("u"), "left")
      .where(col("prn").isNull || col("rn") <= col("prn"))
      .localCheckpoint() // feeds the lag pass AND the tail pass
    val byU = Window.partitionBy("u").orderBy("rn")
    val steps = kept
      .withColumn("f", coalesce(lag(col("st"), 1).over(byU), lit("START")))
      .select(col("f"), col("st").as("t"))
    val byUdesc = Window.partitionBy("u").orderBy(col("rn").desc)
    val tails = kept.withColumn("rr", row_number().over(byUdesc))
      .where(col("rr") === 1 && col("st") =!= "CONV")
      .select(col("st").as("f"), lit("NULL").as("t"))
    val cells = steps.unionAll(tails)
      .groupBy("f", "t").agg(count(lit(1)).as("n"))
      .collect().map(r => (r.getString(0), r.getString(1), r.getLong(2)))
    val channels = cells.flatMap(c => Seq(c._1, c._2)).distinct
      .filterNot(s => s == "START" || s == "CONV" || s == "NULL").sorted
    val trans = "START" +: channels
    val cnt = cells.map { case (f, t, n) => (f, t) -> n }.toMap
    val rowTot = trans.map(s =>
      s -> cells.filter(_._1 == s).map(_._3).sum).toMap
    def pConvStart(blocked: Option[String]): Long = {
      var p = trans.map(_ -> 0L).toMap
      for (_ <- 1 to rounds) {
        p = trans.map { s =>
          if (blocked.contains(s)) s -> 0L
          else {
            val tot = rowTot(s)
            if (tot == 0) s -> 0L
            else {
              // CONV term first, then ascending state order — round₉
              // absorbs sub-quantum fold-order drift (q240 convention)
              var acc = cnt.getOrElse((s, "CONV"), 0L).toDouble / tot
              trans.foreach { j =>
                if (!blocked.contains(j))
                  acc += (p(j) / 1e9) *
                    (cnt.getOrElse((s, j), 0L).toDouble / tot)
              }
              s -> math.round(acc * 1e9)
            }
          }
        }.toMap
      }
      p("START")
    }
    val qb = pConvStart(None)
    require(qb > 0, s"no conversions into $absorb reach START")
    val perChannel = channels.map(c => (c, qb, pConvStart(Some(c))))
    val sumDiff = perChannel.map { case (_, b, c) => b - c }.sum
    // every conversion direct (START→CONV) → no channel carries any
    // removal mass; 0/0 shares would be NaN, so fail loudly instead
    require(sumDiff > 0,
      "no channel influences conversion (all paths are direct) — " +
        "attribution shares are undefined")
    perChannel.toSeq.toDF("channel", "qb", "qc")
      .select(col("channel"),
        (round(col("qb").cast("double") / 1000.0) / 1000000.0)
          .as("p_conv_base"),
        (round(col("qc").cast("double") / 1000.0) / 1000000.0)
          .as("p_conv_without"),
        (round((col("qb") - col("qc")).cast("double")
          / col("qb").cast("double") * 1000000.0) / 1000000.0)
          .as("removal_effect"),
        (round((col("qb") - col("qc")).cast("double")
          / lit(sumDiff.toDouble) * 1000000.0) / 1000000.0)
          .as("attribution"))
      .orderBy("channel")
  }

  /** Additive Holt–Winters triple exponential smoothing over the dense
    * daily count series (α = β = γ = 1/2, weekly season) — the named
    * classical forecaster completing the q259 EWMA / q223 weekday-
    * profile / q396 rolling-origin family with level + trend + seasonal
    * state. Fully deterministic cross-engine: observations quantize to
    * integers (count·2^20) and every state update is integer adds plus
    * ONE division by 2 truncating toward zero (α = 1/2 makes each
    * smoothing a midpoint; Scala Long `/` == DuckDB `//`, which
    * TRUNCATES on negatives — measured, not floor). Cold start after
    * the first week: truncated week-1 mean level, zero trend, week-1
    * residual seasonals. Emits one
    * row per day from day 8 with the one-step-ahead fit and error.
    *
    * SCALE: the day series is CALENDAR-bounded (the q237/q259 model
    * contract) — it collects to the driver and the recurrence is a
    * driver-side loop over days; corpus work is ONE daily count
    * aggregation. */
  def holtWinters(events: DataFrame,
      dayNs: Long = 86400L * 1000000000L, period: Int = 7): DataFrame = {
    val spark = events.sparkSession
    import spark.implicits._
    val days = denseDailyCounts(events, dayNs).orderBy("day")
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    require(days.length > period,
      s"holtWinters needs more than $period days, got ${days.length}")
    val Q = 1048576L // 2^20
    val obs = days.map(_._2 * Q)
    var l = obs.take(period).sum / period
    var b = 0L
    val s = scala.collection.mutable.Queue(obs.take(period).map(_ - l): _*)
    val out = scala.collection.mutable.ArrayBuffer
      .empty[(Long, Long, Long, Long, Long, Long, Long)]
    for (t <- period until days.length) {
      val c1 = s.head // the season slot from `period` days back
      val fit = l + b + c1
      val o = obs(t)
      val lN = (o - c1 + l + b) / 2
      val bN = (lN - l + b) / 2
      val sN = (o - lN + c1) / 2
      out += ((days(t)._1, days(t)._2, fit, lN, bN, sN, math.abs(o - fit)))
      l = lN; b = bN
      s.dequeue(); s.enqueue(sN)
    }
    def disp(c: org.apache.spark.sql.Column) =
      round(c.cast("double") / 1048576.0 * 1000000.0) / 1000000.0
    out.toSeq.toDF("day", "n", "fq", "lq", "bq", "sq", "eq")
      .select(col("day"), col("n"), disp(col("fq")).as("fitted"),
        disp(col("lq")).as("level"), disp(col("bq")).as("trend"),
        disp(col("sq")).as("seasonal"), disp(col("eq")).as("abs_err"))
      .orderBy("day")
  }

  /** Classical additive seasonal decomposition of the dense daily
    * count series: trend = centered 7-day moving average, seasonal =
    * per-weekday mean of the detrended values re-centered to sum ~0,
    * remainder = detrended − seasonal — the textbook decompose()
    * complementing [[holtWinters]] (which FORECASTS; this EXPLAINS).
    * Exact cross-engine: counts quantize ×2^20 and every mean is an
    * integer `div` truncating toward zero (Spark `div` == DuckDB `//`,
    * both truncate on negatives). Emits interior days only (the
    * centered window needs ±3 neighbors).
    *
    * SCALE: the moving average is an offset-explode self-join on the
    * day key (the dailyAcf shape — shuffle-keyed, NEVER a one-partition
    * global window); weekday means are a 7-row model aggregation. */
  def seasonalDecompose(events: DataFrame,
      dayNs: Long = 86400L * 1000000000L): DataFrame = {
    val dense = denseDailyCounts(events, dayNs).localCheckpoint()
    val Q = 1048576L
    val tr = dense
      .select(col("day"), explode(sequence(lit(-3L), lit(3L))).as("off"))
      .select((col("day") + col("off")).as("bday"),
        col("day").as("cday"))
      .join(dense.select(col("day").as("bday"), col("c").as("cb")), "bday")
      .groupBy(col("cday").as("day"))
      .agg(count(lit(1)).as("w"), sum(col("cb")).as("s"))
      .where(col("w") === 7)
      .select(col("day"), expr(s"(s * $Q) div 7").as("trend_q"))
    val det = dense.join(tr, "day")
      .select(col("day"), col("c"),
        (col("c") * Q - col("trend_q")).as("det_q"), col("trend_q"),
        pmod(col("day"), lit(7L)).as("wd"))
      .localCheckpoint() // feeds the weekday means AND the output rows
    val wmean = det.groupBy("wd")
      .agg(expr("sum(det_q) div count(1)").as("m_q"))
    val center = wmean.agg(expr("sum(m_q) div 7").as("g_q"))
    val sidx = wmean.crossJoin(broadcast(center))
      .select(col("wd"), (col("m_q") - col("g_q")).as("s_q"))
    def disp(c: org.apache.spark.sql.Column) =
      round(c.cast("double") / 1048576.0 * 1000000.0) / 1000000.0
    det.join(broadcast(sidx), "wd")
      .select(col("day"), col("c").as("n"),
        disp(col("trend_q")).as("trend"),
        disp(col("s_q")).as("seasonal"),
        disp(col("det_q") - col("s_q")).as("remainder"))
      .orderBy("day")
  }

  /** Theil–Sen robust trend of the dense daily count series: the
    * MEDIAN of all pairwise slopes (c_j − c_i)/(j − i), with the
    * intercept as the median of c_i − slope·day_i — the outlier-proof
    * alternative to [[dailyAcf]]'s OLS-style folds (one flood day
    * cannot bend it; breakdown point 29%).
    *
    * Determinism: slopes are single IEEE divisions of exact integers —
    * identical doubles either engine; the median is nearest-rank over
    * the sorted slope list with a (j, i) tiebreak, so selection is
    * total-order deterministic.
    *
    * SCALE: the day series is domain-sized; the pair set is days² —
    * still domain-bounded (a decade is ~3.6 k days → 6.7 M pairs,
    * shuffle-keyed). Output: 1 row. */
  def theilSenTrend(events: DataFrame,
      dayNs: Long = 86400L * 1000000000L): DataFrame = {
    val dense = denseDailyCounts(events, dayNs).localCheckpoint()
    val a = dense.select(col("day").as("di"), col("c").as("ci"))
    val b = dense.select(col("day").as("dj"), col("c").as("cj"))
    val slopes = a.join(b, col("dj") > col("di"))
      .select(((col("cj") - col("ci")).cast("double") /
        (col("dj") - col("di")).cast("double")).as("s"),
        col("di"), col("dj"))
    val n = slopes.agg(count(lit(1)).as("n"))
    // domain-bounded window: day-PAIR table — calendar-squared, never corpus-sized
    val w = Window.orderBy(col("s"), col("di"), col("dj"))
    val slope = slopes.join(broadcast(n))
      .withColumn("rn", row_number().over(w).cast("long"))
      .where(col("rn") === ceil(col("n").cast("double") / 2.0).cast("long"))
      .select(col("s").as("slope"))
    val resid = dense.join(broadcast(slope))
      .select(col("day"),
        (col("c").cast("double") - col("slope") * col("day").cast("double"))
          .as("r"), col("slope"))
    val nd = resid.agg(count(lit(1)).as("nd"))
    // domain-bounded window: residuals per calendar day — calendar-sized
    val wi = Window.orderBy(col("r"), col("day"))
    resid.join(broadcast(nd))
      .withColumn("rn", row_number().over(wi).cast("long"))
      .where(col("rn") === ceil(col("nd").cast("double") / 2.0).cast("long"))
      .select((round(col("slope") * 1000000.0) / 1000000.0).as("slope"),
        (round(col("r") * 1000000.0) / 1000000.0).as("intercept"))
  }

  /** Rolling `windowDays`-day distinct active users per day: each
    * (day, user) presence row is EXPLODED to the days it contributes
    * to (day..day+w−1) and the target day counts distinct users — the
    * equi-join shape for a rolling DISTINCT (a range join would be a
    * nested-loop; distinct doesn't slide, so each target recounts).
    *
    * SCALE: presence dedups map-side to (day, user); the explode
    * multiplies by the window length only; the count-distinct
    * aggregation is day-keyed. Bounds row broadcast. */
  def rollingActiveUsers(events: DataFrame, windowDays: Int = 7,
      dayNs: Long = 86400L * 1000000000L): DataFrame = {
    val du = events.select(expr(s"ts div $dayNs").as("day"), col("user_id"))
      .distinct()
    val bounds = du.agg(min("day").as("mn"), max("day").as("mx"))
    du.select(explode(sequence(col("day"),
        col("day") + lit((windowDays - 1).toLong))).as("d"), col("user_id"))
      .join(broadcast(bounds))
      .where(col("d") <= col("mx"))
      .groupBy(col("d").as("day"))
      .agg(countDistinct(col("user_id")).as("rolling_users"))
      .orderBy("day")
  }

  /** Kaplan–Meier survival curve for entry→conversion durations with
    * right-censoring: per user, time from first `entryType` to first
    * subsequent `conversionType` (event) or to their last activity
    * (censored); at each distinct duration d (in days),
    * S(d) = Π_{d'≤d} (1 − e_{d'}/n_{d'}) over event-bearing times —
    * the censoring-correct answer to "what fraction converts within
    * t?", which q192's completed-only bands overstate.
    *
    * Determinism: durations, event/censor counts and at-risk counts
    * are exact integers; the product runs as exp(Σ ln(1 − e/n)) with
    * the Σ a CUMULATIVE WINDOW over the sorted duration domain — a
    * fixed summation order, so both engines fold identical doubles
    * (display-rounded 1e-6).
    *
    * SCALE: two user-keyed aggregations and one keyed join build the
    * per-user duration row; everything after is duration-domain-sized
    * (the single-partition window is domain-bounded, documented). */
  def kaplanMeier(events: DataFrame, entryType: String = "view",
      conversionType: String = "purchase",
      dayNs: Long = 86400L * 1000000000L): DataFrame = {
    val entry = events.groupBy("user_id").agg(
      min(when(col("event_type") === entryType, col("ts"))).as("t0"),
      max(col("ts")).as("tmax"))
      .where(col("t0").isNotNull)
    val conv = events.where(col("event_type") === conversionType)
      .select(col("user_id"), col("ts"))
      .join(entry.select("user_id", "t0"), "user_id")
      .where(col("ts") >= col("t0"))
      .groupBy("user_id").agg(min(col("ts")).as("tp"))
    val dur = entry.join(conv, Seq("user_id"), "left")
      .select(col("user_id"),
        when(col("tp").isNotNull, expr(s"(tp - t0) div $dayNs"))
          .otherwise(expr(s"(tmax - t0) div $dayNs")).as("dur"),
        col("tp").isNotNull.cast("long").as("ev"))
    val cell = dur.groupBy("dur")
      .agg(sum(col("ev")).as("e"), sum(lit(1L) - col("ev")).as("c"))
    val tot = cell.agg(sum(col("e") + col("c")).as("n"))
    // domain-bounded windows: `dur` is DAY-grain — calendar-sized, never corpus-sized
    val prior = org.apache.spark.sql.expressions.Window.orderBy("dur")
      .rowsBetween(org.apache.spark.sql.expressions.Window.unboundedPreceding, -1)
    val upto = org.apache.spark.sql.expressions.Window.orderBy("dur")
      .rowsBetween(org.apache.spark.sql.expressions.Window.unboundedPreceding, 0)
    val risk = col("n") - coalesce(sum(col("e") + col("c")).over(prior), lit(0L))
    // e == n_risk means everyone still at risk converts here: S hits an
    // absorbing 0 (ln would be -inf) — carried as an explicit flag.
    val term = when(col("e") > 0 && col("e") < col("n_risk"),
      log(lit(1.0) - col("e").cast("double") / col("n_risk").cast("double")))
      .otherwise(lit(0.0))
    val dead = sum(when(col("e") === col("n_risk"), 1L).otherwise(0L))
      .over(upto)
    cell.join(broadcast(tot))
      .withColumn("n_risk", risk)
      .withColumn("survival", when(dead > 0, lit(0.0)).otherwise(
        round(exp(sum(term).over(upto)) * 1000000.0) / 1000000.0))
      .select(col("dur").as("duration_days"), col("n_risk"),
        col("e").as("events"), col("c").as("censored"), col("survival"))
      .orderBy("duration_days")
  }

  /** Nelson–Aalen cumulative-hazard estimator over the SAME
    * entry→conversion duration table as [[kaplanMeier]]: H(t) =
    * Σ_{dur≤t} e/n_risk, plus the Fleming–Harrington survival exp(−H) —
    * the small-risk-set-robust companion to the KM product-limit curve.
    * Per-cell hazard terms divide exact integer counts; the ordered
    * cumulative sum is the only double fold and is 6-dp rounded.
    *
    * SCALE: identical profile to kaplanMeier — two user-keyed shuffles
    * to build durations, then all window work runs on the per-DAY cell
    * table (calendar-bounded, thousands of rows at any corpus size). */
  def nelsonAalen(events: DataFrame, entryType: String = "view",
      conversionType: String = "purchase",
      dayNs: Long = 86400L * 1000000000L): DataFrame = {
    val entry = events.groupBy("user_id").agg(
      min(when(col("event_type") === entryType, col("ts"))).as("t0"),
      max(col("ts")).as("tmax"))
      .where(col("t0").isNotNull)
    val conv = events.where(col("event_type") === conversionType)
      .select(col("user_id"), col("ts"))
      .join(entry.select("user_id", "t0"), "user_id")
      .where(col("ts") >= col("t0"))
      .groupBy("user_id").agg(min(col("ts")).as("tp"))
    val dur = entry.join(conv, Seq("user_id"), "left")
      .select(
        when(col("tp").isNotNull, expr(s"(tp - t0) div $dayNs"))
          .otherwise(expr(s"(tmax - t0) div $dayNs")).as("dur"),
        col("tp").isNotNull.cast("long").as("ev"))
    val cell = dur.groupBy("dur")
      .agg(sum(col("ev")).as("e"), sum(lit(1L) - col("ev")).as("c"))
    val tot = cell.agg(sum(col("e") + col("c")).as("n"))
    // domain-bounded windows: `dur` is DAY-grain — calendar-sized, never corpus-sized
    val prior = org.apache.spark.sql.expressions.Window.orderBy("dur")
      .rowsBetween(org.apache.spark.sql.expressions.Window.unboundedPreceding, -1)
    val upto = org.apache.spark.sql.expressions.Window.orderBy("dur")
      .rowsBetween(org.apache.spark.sql.expressions.Window.unboundedPreceding, 0)
    val risk = col("n") - coalesce(sum(col("e") + col("c")).over(prior), lit(0L))
    val term = when(col("e") > 0,
      col("e").cast("double") / col("n_risk").cast("double"))
      .otherwise(lit(0.0))
    cell.join(broadcast(tot))
      .withColumn("n_risk", risk)
      .withColumn("ch", sum(term).over(upto))
      .select(col("dur").as("duration_days"), col("n_risk"),
        col("e").as("events"), col("c").as("censored"),
        (round(col("ch") * 1000000.0) / 1000000.0).as("cum_hazard"),
        (round(exp(-col("ch")) * 1000000.0) / 1000000.0).as("survival_fh"))
      .orderBy("duration_days")
  }

  /** Weekly engagement stickiness: per week, the weekly-active-user
    * count, the average daily-active-user count over the week's active
    * span, and the DAU/WAU ratio — the product-health scalar ("how many
    * of this week's users show up on a given day").
    *
    * SCALE: two exact-distinct aggregations (day-keyed and week-keyed)
    * over one projection; the join is week-keyed. */
  def stickiness(events: DataFrame,
      dayNs: Long = 86400L * 1000000000L): DataFrame = {
    val base = events.select(expr(s"ts div $dayNs").as("day"),
      col("user_id"))
    val daily = base.groupBy("day")
      .agg(countDistinct(col("user_id")).as("dau"))
      .groupBy(expr("day div 7").as("week"))
      .agg(count(lit(1)).as("active_days"), sum(col("dau")).as("dau_sum"))
    val weekly = base.groupBy(expr("day div 7").as("week"))
      .agg(countDistinct(col("user_id")).as("wau"))
    daily.join(weekly, "week")
      .select(col("week"), col("active_days"), col("wau"),
        (round(col("dau_sum").cast("double") /
          col("active_days").cast("double") * 1000000.0) / 1000000.0)
          .as("dau_avg"),
        (round(col("dau_sum").cast("double") /
          col("active_days").cast("double") / col("wau").cast("double")
          * 1000000.0) / 1000000.0).as("stickiness"))
      .orderBy("week")
  }

  /** New vs returning weekly actives: each week's distinct users split
    * by whether this is their first-seen week — the growth-mix row
    * (is the product acquiring or retaining?) next to [[cohortLtv]].
    *
    * SCALE: one user-keyed first-seen aggregation, one (week, user)
    * distinct, a user-keyed join, a week-sized output. */
  def newVsReturning(events: DataFrame,
      weekNs: Long = 604800L * 1000000000L): DataFrame = {
    val base = events.select(expr(s"ts div $weekNs").as("wk"),
      col("user_id")).distinct()
    val first = base.groupBy("user_id").agg(min("wk").as("fw"))
    base.join(first, "user_id")
      .groupBy("wk")
      .agg(count(lit(1)).as("active_users"),
        sum(when(col("wk") === col("fw"), 1L).otherwise(0L)).as("new_users"))
      .select(col("wk").as("week"), col("active_users"), col("new_users"),
        (col("active_users") - col("new_users")).as("returning_users"),
        (round(col("new_users").cast("double") /
          col("active_users").cast("double") * 1000000.0) / 1000000.0)
          .as("new_frac"))
      .orderBy("week")
  }

  /** Day-of-week load profile over the dense daily series: events and
    * active days per weekday slot, the per-day mean, and the index vs
    * the grand daily mean (1.0 = flat; a lopsided index = weekly
    * seasonality worth modeling before any anomaly gate). Weekday is
    * epoch-day mod 7 — a fixed, engine-portable labeling (slot 0 =
    * Thursday for the Unix epoch; the INDEX shape is what matters).
    *
    * SCALE: one corpus pass to the day table; everything after is
    * 7-row work. All counts exact; two divisions per output row. */
  def weekdayProfile(events: DataFrame,
      dayNs: Long = 86400L * 1000000000L): DataFrame = {
    val dense = denseDailyCounts(events, dayNs)
    val tot = dense.agg(sum(col("c")).as("s"), count(lit(1)).as("t"))
    dense.select(pmod(col("day"), lit(7L)).as("dow"), col("c"))
      .groupBy("dow")
      .agg(count(lit(1)).as("n_days"), sum(col("c")).as("events"))
      .join(broadcast(tot))
      .select(col("dow"), col("n_days"), col("events"),
        (round(col("events").cast("double") / col("n_days").cast("double")
          * 1000000.0) / 1000000.0).as("mean_per_day"),
        (round(col("events").cast("double") / col("n_days").cast("double")
          / (col("s").cast("double") / col("t").cast("double"))
          * 1000000.0) / 1000000.0).as("index_vs_grand"))
      .orderBy("dow")
  }

  /** First-touch / last-touch conversion attribution: every `convertType`
    * event's value (exact cents) is credited to the user's FIRST
    * preceding non-conversion event type ever (first-touch) and to the
    * LAST one within `windowNs` (last-touch); conversions with no
    * qualifying touch credit "direct". The two models aggregate to one
    * (model, channel) report — the marketing-mix table every funnel
    * review wants next to q117.
    *
    * SCALE: one user-keyed window pass (first/last ignore-nulls carry
    * over the same (ts, seq) order the session chain uses), then a
    * channel-domain-sized aggregation. No self-joins. */
  def touchAttribution(events: DataFrame, windowNs: Long,
      convertType: String = "purchase", valueCol: String = "value",
      userCol: String = "user_id", typeCol: String = "event_type",
      tsCol: String = "ts", seqCol: String = "event_id"): DataFrame = {
    val byUser = Window.partitionBy(userCol)
      .orderBy(col(tsCol), col(seqCol))
      .rowsBetween(Window.unboundedPreceding, -1)
    val touch = when(col(typeCol) =!= convertType,
      struct(col(tsCol).as("t"), col(seqCol).as("s"), col(typeCol).as("e")))
    val tagged = events
      .withColumn("_last", last(touch, ignoreNulls = true).over(byUser))
      .withColumn("_first", first(touch, ignoreNulls = true).over(byUser))
    val purch = tagged.where(col(typeCol) === convertType)
      .select(
        when(col("_last").isNotNull &&
          col(tsCol) - col("_last.t") <= windowNs, col("_last.e"))
          .otherwise(lit("direct")).as("last_touch"),
        when(col("_first").isNotNull, col("_first.e"))
          .otherwise(lit("direct")).as("first_touch"),
        round(col(valueCol) * lit(100.0)).cast("long").as("cents"))
    def agg(model: String, chan: Column): DataFrame =
      purch.groupBy(chan.as("channel"))
        .agg(count(lit(1)).as("conversions"), sum(col("cents")).as("cents"))
        .select(lit(model).as("model"), col("channel"),
          col("conversions"), col("cents"))
    agg("first_touch", col("first_touch"))
      .unionAll(agg("last_touch", col("last_touch")))
      .orderBy("model", "channel")
  }

  /** Cohort LTV accumulation: users cohorted by first-seen week, value
    * (converted to exact integer cents, `convertType` events only)
    * summed per (cohort, age-in-weeks) cell and accumulated along age —
    * the revenue twin of the q125 retention matrix, read as "how much
    * has the week-W cohort spent by age A, per user".
    *
    * SCALE: the cohort assignment is one user-keyed aggregation; the
    * cell grid is (weeks × weeks)-sized; the cumulative window is
    * cohort-partitioned over ages. Cohort sizes re-enter as a
    * broadcast. All sums exact integers; one division per output row. */
  def cohortLtv(events: DataFrame, weekNs: Long = 604800L * 1000000000L,
      convertType: String = "purchase"): DataFrame = {
    val base = events.select(col("user_id"),
      expr(s"ts div $weekNs").as("wk"),
      when(col("event_type") === convertType,
        round(col("value") * lit(100.0)).cast("long")).otherwise(lit(0L))
        .as("cents"))
    val cohort = base.groupBy("user_id").agg(min("wk").as("cw"))
    val sized = cohort.groupBy("cw").agg(count(lit(1)).as("cohort_users"))
    val cells = base.join(cohort, "user_id")
      .groupBy(col("cw"), (col("wk") - col("cw")).as("age"))
      .agg(sum(col("cents")).as("cents"))
    val w = Window.partitionBy("cw").orderBy("age")
      .rowsBetween(Window.unboundedPreceding, 0)
    cells.withColumn("cum_cents", sum(col("cents")).over(w))
      .join(broadcast(sized), "cw")
      .select(col("cw").as("cohort_week"), col("age"), col("cents"),
        col("cum_cents"), col("cohort_users"),
        (round(col("cum_cents").cast("double") /
          col("cohort_users").cast("double") * 1000000.0) / 1000000.0)
          .as("ltv_cents_per_user"))
      .orderBy("cohort_week", "age")
  }

  /** Market-basket lift between event types at SESSION granularity:
    * for each unordered type pair, lift = P(a,b)/(P(a)·P(b)) over
    * sessions (same 30-min-gap chain as [[sessionStats]]) — which
    * behaviors co-occur in a visit beyond chance. Counts are session-
    * presence (distinct), all exact integers; lift is one double
    * composition at the pair-table output.
    *
    * SCALE: sessionization is the one keyed window pass; presence
    * dedups map-side to (session, type) — type-domain-bounded per
    * session; the pair self-join is keyed on the session and emits
    * ≤ |types|² rows per session. Marginals and the session total
    * re-enter as broadcasts. */
  def sessionLift(events: DataFrame, gapNs: Long,
      userCol: String = "user_id", typeCol: String = "event_type",
      tsCol: String = "ts", seqCol: String = "event_id"): DataFrame = {
    val byUser = Window.partitionBy(userCol).orderBy(col(tsCol), col(seqCol))
    val sess = events
      .withColumn("_prev_ts", lag(col(tsCol), 1).over(byUser))
      .withColumn("_new_sess",
        when(col("_prev_ts").isNull ||
          (col(tsCol) - col("_prev_ts")) > gapNs, 1L).otherwise(0L))
      .withColumn("sess_id", sum(col("_new_sess")).over(byUser))
    val pres = sess.select(col(userCol).as("u"), col("sess_id"),
      col(typeCol).as("t")).distinct()
    val tot = pres.select("u", "sess_id").distinct()
      .agg(count(lit(1)).as("ns"))
    val singles = pres.groupBy("t").agg(count(lit(1)).as("na"))
    val pairs = pres.select(col("u"), col("sess_id"), col("t").as("ta"))
      .join(pres.select(col("u"), col("sess_id"), col("t").as("tb")),
        Seq("u", "sess_id"))
      .where(col("ta") < col("tb"))
      .groupBy("ta", "tb").agg(count(lit(1)).as("n_ab"))
    pairs
      .join(broadcast(singles.select(col("t").as("ta"), col("na"))), "ta")
      .join(broadcast(singles.select(col("t").as("tb"),
        col("na").as("nb"))), "tb")
      .join(broadcast(tot))
      .select(col("ta"), col("tb"), col("n_ab"), col("na"), col("nb"),
        col("ns").as("n_sessions"),
        (round(col("n_ab").cast("double") * col("ns").cast("double") /
          (col("na").cast("double") * col("nb").cast("double"))
          * 1000000.0) / 1000000.0).as("lift"))
      .orderBy("ta", "tb")
  }
}
