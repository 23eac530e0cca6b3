package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Distributed classical statistics whose sufficient statistics are kept
  * in exact integer arithmetic until a final single-row double chain —
  * the [[EventOps]]/[[QualityClassifier]] determinism discipline applied
  * to hypothesis testing. Reference behavior: the reference pipeline has
  * no stats module; these are engine-surface extensions for corpus
  * drift/AB analysis at warehouse scale.
  */
object Stats {

  private val dec = org.apache.spark.sql.types.DecimalType(38, 0)

  /** Mann-Whitney U (Wilcoxon rank-sum) comparing `valueCol` between the
    * rows where `isGroup1` is true and the rest, with average ranks for
    * ties and the tie-corrected normal approximation.
    *
    * Exactness: ranks never exist per row. Grouping by distinct value
    * gives (n1_v, t_v); with cumB_v = Σ_{u<v} t_u, the doubled rank sum
    * R1×2 = Σ_v n1_v·(2·cumB_v + t_v + 1) is an EXACT integer
    * (decimal(38,0) sums — the per-term product wraps a long at ~10⁹·10⁹
    * pooled rows), as are U1×2 and the tie term Σ(t³−t). Doubles appear
    * only in the final one-row z chain, a fixed IEEE composition.
    *
    * SCALE: one corpus aggregation to the distinct-value table, then the
    * shared [[DistributedRank.prefixSum]] two-phase prefix sum over it:
    * range-partition by value (parallel, sampled boundaries), one
    * partition-count-sized collect of per-partition tie totals, and a
    * broadcast-offset map-side pass gives every distinct value its exact
    * global cumB with no one-partition window anywhere. Output: 1 row. */
  def mannWhitneyU(df: DataFrame, valueCol: Column,
      isGroup1: Column): DataFrame = {
    val byValue = df
      .select(valueCol.cast("double").as("v"),
        when(isGroup1, 1L).otherwise(0L).as("g1"))
      .groupBy("v")
      .agg(sum("g1").as("n1v"), count(lit(1)).as("tv"))
    val withCum = DistributedRank.prefixSum(byValue, Nil, Seq(col("v")),
      Seq("tv" -> "cumb"), inclusive = false)
    val agg = withCum.agg(
      sum(col("n1v")).cast(dec).as("n1"),
      (sum(col("tv")) - sum(col("n1v"))).cast(dec).as("n2"),
      sum(col("n1v").cast(dec) *
        (lit(2).cast(dec) * col("cumb").cast(dec) + col("tv").cast(dec) +
          lit(1).cast(dec))).as("r1x2"),
      sum(col("tv").cast(dec) * col("tv").cast(dec) * col("tv").cast(dec) -
        col("tv").cast(dec)).as("ties"))
    val n1d = col("n1").cast("double")
    val n2d = col("n2").cast("double")
    val nTot = (col("n1") + col("n2")).cast("double")
    // U1×2 = R1×2 − 2·n1(n1+1)/2 = R1×2 − n1(n1+1): still exact integer
    val u1x2 = (col("r1x2") - col("n1") * (col("n1") + lit(1).cast(dec)))
      .cast("double")
    val mu2 = n1d * n2d // 2·mean of U
    val sigma = sqrt(n1d * n2d / 12.0 *
      ((nTot + 1.0) - col("ties").cast("double") / (nTot * (nTot - 1.0))))
    agg.select(col("n1").cast("long").as("n1"),
      col("n2").cast("long").as("n2"),
      (u1x2 / 2.0).as("u1"),
      (round((u1x2 - mu2) / (lit(2.0) * sigma) * 1000000.0) / 1000000.0)
        .as("z"))
  }

  /** Two-sided normal p-value 2·(1−Φ(az)) via the Abramowitz-Stegun
    * 26.2.17 polynomial — a LITERAL Horner chain every oracle mirrors
    * verbatim, so both engines produce identical p doubles (|error|
    * < 7.5e-8, far above the 1e-6 display rounding). `az` must be the
    * absolute z. */
  private[graft] def normTwoSidedP(az: Column): Column = {
    val t = lit(1.0) / (lit(1.0) + lit(0.2316419) * az)
    val poly = t * (lit(0.319381530) + t * (lit(-0.356563782) +
      t * (lit(1.781477937) + t * (lit(-1.821255978) +
        t * lit(1.330274429)))))
    lit(2.0) * (lit(0.3989422804014327) * exp(-az * az / 2.0) * poly)
  }

  /** Sample-ratio-mismatch check (the first thing to run on ANY
    * experiment): distinct units per variant vs the 50/50 design,
    * 1-dof chi-squared goodness of fit, p via [[normTwoSidedP]](√χ²),
    * flagged at the industry-standard p < 0.001. A failed SRM means
    * the assignment (or logging) is broken and every downstream
    * metric is untrustworthy.
    *
    * SCALE: one distinct-aggregation keyed by variant; 1-row output. */
  def srmCheck(df: DataFrame, variantCol: Column,
      unitCol: Column): DataFrame = {
    val counts = df.select(variantCol.as("v"), unitCol.as("u"))
      .groupBy("v").agg(countDistinct("u").as("n"))
    val agg = counts.agg(
      sum(when(col("v") === 0, col("n")).otherwise(0L)).as("na"),
      sum(when(col("v") === 1, col("n")).otherwise(0L)).as("nb"))
    val nD = (col("na") + col("nb")).cast("double")
    val e = nD / 2.0
    val da = col("na").cast("double") - e
    val db = col("nb").cast("double") - e
    val chi2 = da * da / e + db * db / e
    agg.select(col("na").cast("long").as("n_a"),
      col("nb").cast("long").as("n_b"),
      (round(chi2 * 1000000.0) / 1000000.0).as("chi2"),
      (round(normTwoSidedP(sqrt(chi2)) * 1000000.0) / 1000000.0).as("p"),
      (normTwoSidedP(sqrt(chi2)) < 0.001).as("srm_flag"))
  }

  /** Chi-squared test of independence between two categorical columns
    * with Cramér's V effect size: observed cell counts vs the
    * margin-product expectation, INCLUDING structurally-empty cells
    * (absent (i,j) groups still contribute (0−e)²/e = e — the margins
    * cross-join restores them). Exact integer counts; e and every term
    * compose in one double chain.
    *
    * SCALE: one corpus aggregation to the cell table; margins and the
    * restored grid are category²-sized (model-sized). Output: 1 row. */
  def chiSquaredIndependence(df: DataFrame, rowCol: Column,
      colCol: Column): DataFrame = {
    val cells = df.groupBy(rowCol.as("r"), colCol.as("c"))
      .agg(count(lit(1)).as("o")).localCheckpoint()
    val rm = cells.groupBy("r").agg(sum("o").as("ri"))
    val cm = cells.groupBy("c").agg(sum("o").as("cj"))
    val tot = cells.agg(sum("o").as("n"),
      countDistinct("r").as("nr"), countDistinct("c").as("nc"))
    val grid = rm.join(broadcast(cm)).join(broadcast(tot))
      .join(cells, Seq("r", "c"), "left")
      .select(col("n"), col("nr"), col("nc"),
        coalesce(col("o"), lit(0L)).cast("double").as("od"),
        (col("ri").cast("double") * col("cj").cast("double") /
          col("n").cast("double")).as("e"))
    grid.groupBy("n", "nr", "nc")
      .agg(sum((col("od") - col("e")) * (col("od") - col("e")) / col("e"))
        .as("chi2"))
      .select(col("n").cast("long").as("n"),
        col("nr").cast("long").as("n_row_classes"),
        col("nc").cast("long").as("n_col_classes"),
        ((col("nr") - 1) * (col("nc") - 1)).cast("long").as("dof"),
        (round(col("chi2") * 1000000.0) / 1000000.0).as("chi2"),
        (round(sqrt(col("chi2") / (col("n").cast("double") *
          least(col("nr") - 1, col("nc") - 1).cast("double")))
          * 1000000.0) / 1000000.0).as("cramers_v"))
  }

  /** Benjamini-Hochberg FDR control over per-group one-sample z-tests:
    * each group's mean of an integral metric against the corpus mean
    * (corpus sd), two-sided p via the Abramowitz-Stegun 26.2.17 normal
    * CDF polynomial — the SAME literal Horner chain in the oracle, so
    * both engines produce identical p doubles — then the step-up rule:
    * discoveries are ranks ≤ max{k : p₍ₖ₎ ≤ k·α/m}. The multiple-
    * testing answer to "which sources actually deviate" that per-test
    * α inflates.
    *
    * SCALE: two aggregations (corpus + group moments, map-side
    * combined); the rank/step-up pass runs on the group-sized table
    * (model-sized window, documented). */
  def bhFdr(df: DataFrame, groupCol: Column, valueCol: Column,
      alpha: Double = 0.1): DataFrame = {
    val v = valueCol.cast("long")
    val g = df.select(groupCol.as("g"), v.as("v"))
      .groupBy("g").agg(count(lit(1)).cast(dec).as("ng"),
        sum(col("v")).cast(dec).as("sg"))
    val tot = df.select(v.as("v"))
      .agg(count(lit(1)).cast(dec).as("n"), sum(col("v")).cast(dec).as("s"),
        sum(col("v").cast(dec) * col("v").cast(dec)).as("ss"))
    val nD = col("n").cast("double")
    val mean = col("s").cast("double") / nD
    val sd = sqrt((col("ss").cast("double") -
      col("s").cast("double") * col("s").cast("double") / nD) / nD)
    val z = (col("sg").cast("double") / col("ng").cast("double") - mean) /
      (sd / sqrt(col("ng").cast("double")))
    // A&S 26.2.17 upper-tail, literal Horner chain (shared with oracle)
    val p = normTwoSidedP(abs(col("z")))
    val scored = g.join(broadcast(tot))
      .select(col("g"), col("ng").cast("long").as("n_g"), z.as("z"))
      .withColumn("p", p)
    // domain-bounded window: one row per GROUP (the tested families), never corpus-sized
    val byP = org.apache.spark.sql.expressions.Window
      .orderBy(col("p"), col("g")) // group-sized window
    val m0 = scored.count()
    val ranked = scored.withColumn("rnk", row_number().over(byP))
      .withColumn("thr", col("rnk").cast("double") * alpha / m0.toDouble)
    val kmax = ranked.agg(max(when(col("p") <= col("thr"), col("rnk")))
      .as("kmax"))
    ranked.join(broadcast(kmax))
      .select(col("g"), col("n_g"),
        (round(col("z") * 1000000.0) / 1000000.0).as("z"),
        (round(col("p") * 1000000.0) / 1000000.0).as("p"),
        col("rnk").cast("long").as("rnk"),
        (round(col("thr") * 1000000.0) / 1000000.0).as("bh_threshold"),
        coalesce(col("rnk") <= col("kmax"), lit(false)).as("discovery"))
  }

  /** Pairwise Cohen's d effect-size matrix across the groups of
    * `groupCol` on a 2-dp money column: d = (m_a − m_b)/s_pooled with
    * the pooled sample SD — "how big is the difference" where a t/z
    * only says "is there one". Exact cent sufficient sums per group;
    * each pair's d is one double chain over six exact integers.
    *
    * SCALE: one corpus aggregation to the group table, then a
    * group²-sized self-join (model-sized). */
  def pairwiseCohensD(df: DataFrame, groupCol: Column,
      valueCol: Column): DataFrame = {
    val cents = round(valueCol.cast("double") * 100.0).cast("long")
    val g = df.select(groupCol.as("g"), cents.as("c"))
      .groupBy("g")
      .agg(count(lit(1)).cast(dec).as("n"), sum(col("c")).cast(dec).as("s"),
        sum(col("c").cast(dec) * col("c").cast(dec)).as("ss"))
    def m(p: String) = col(s"$p.s").cast("double") /
      col(s"$p.n").cast("double")
    def sv(p: String) = (col(s"$p.ss").cast("double") -
      col(s"$p.s").cast("double") * col(s"$p.s").cast("double") /
        col(s"$p.n").cast("double")) / (col(s"$p.n").cast("double") - 1.0)
    val spool = sqrt(((col("a.n").cast("double") - 1.0) * sv("a") +
      (col("b.n").cast("double") - 1.0) * sv("b")) /
      (col("a.n").cast("double") + col("b.n").cast("double") - 2.0))
    // broadcast the (tiny, group-sized) right side: the non-equi pair
    // join plans as the documented bounded BNLJ, never a CartesianProduct
    g.as("a").join(broadcast(g.as("b")), col("a.g") < col("b.g"))
      .select(col("a.g").as("g_a"), col("b.g").as("g_b"),
        col("a.n").cast("long").as("n_a"), col("b.n").cast("long").as("n_b"),
        (round((m("a") - m("b")) / 100.0 * 100.0) / 100.0).as("mean_diff"),
        (round((m("a") - m("b")) / spool * 1000000.0) / 1000000.0)
          .as("cohens_d"))
  }

  /** Isotonic (PAV) calibration of a [0, 1] score against a binary
    * label, in the CLOSED minimax form: bin the score into `bins`
    * equal-width cells with exact (n, positives) counts, then the
    * nondecreasing least-squares fit at bin i is
    *
    *   iso_i = max_{j ≤ i} min_{k ≥ i} (Σ pos_{j..k}) / (Σ n_{j..k})
    *
    * (Robertson, Wright & Dykstra 1988, thm 1.4.4) — the pool-adjacent-
    * violators SOLUTION without PAV's sequential merge loop, so it is a
    * pure join-aggregate program and the oracle states the same formula.
    * Weighted averages are exact-integer ratios; min/max over them is
    * value-selection, not accumulation — deterministic in any engine.
    *
    * SCALE: the corpus pass is one map-side-combined bin aggregation;
    * everything after runs on ranges of the bin table — O(bins³) rows,
    * bounded by the bin count (model-sized), never by data. */
  def isotonicCalibration(df: DataFrame, scoreCol: Column, labelCol: Column,
      bins: Int = 20): DataFrame = {
    val b = least(floor(scoreCol.cast("double") * bins), lit(bins - 1))
      .cast("long")
    val g = df.select(b.as("bin"), when(labelCol, 1L).otherwise(0L).as("y"))
      .groupBy("bin")
      .agg(count(lit(1)).as("n"), sum("y").as("pos"))
      .localCheckpoint() // bin-sized; feeds ranges + the final join
    val ranges = g.select(col("bin").as("j")).as("lo")
      .join(g.select(col("bin").as("k")), col("j") <= col("k"))
      .join(g, col("bin").between(col("j"), col("k")))
      .groupBy("j", "k")
      .agg((sum("pos").cast("double") / sum("n").cast("double")).as("r"))
    val fitted = g.select(col("bin"))
      .join(ranges, col("j") <= col("bin") && col("k") >= col("bin"))
      .groupBy("bin", "j").agg(min("r").as("inner"))
      .groupBy("bin").agg(max("inner").as("iso"))
    g.join(fitted, Seq("bin"))
      .select(col("bin"), col("n"), col("pos"),
        (round(col("pos").cast("double") / col("n").cast("double")
          * 1000000.0) / 1000000.0).as("raw_rate"),
        (round(col("iso") * 1000000.0) / 1000000.0).as("iso_rate"))
  }

  /** Poisson(1) CDF as double literals — the SAME strings are embedded
    * in the oracle SQL, so both engines threshold identical doubles. */
  private[graft] val PoissonCdf = Seq(
    "0.36787944117144233", "0.7357588823428847", "0.9196986029286058",
    "0.9810118431238463", "0.9963401531726563")

  /** Poisson bootstrap (Chamandy et al. 2012 — the resampling scheme
    * that works in one distributed pass): each (row, replicate) pair
    * draws weight ~ Poisson(1) DETERMINISTICALLY, by inverting the CDF
    * at u = md5₆₀(key@b)/2⁶⁰ — no RNG state, no sampling shuffle, and
    * the oracle replays the identical draws. Returns the plain mean of
    * `valueCol` (a 2-dp money column, folded in exact integer cents)
    * with the order-statistic 90% interval [m₍₅₎, m₍₉₆₎] of the B=100
    * replicate means.
    *
    * Determinism: weights are integer; each replicate's weighted sum is
    * an exact decimal; each replicate mean is one correctly-rounded
    * double ratio. The final rank-5/96 selection compares those exact
    * ratios (b tie-break) — no float-accumulation anywhere.
    *
    * SCALE: one pass over rows×B with map-side combine down to B rows;
    * the order-statistic window runs on the B-row relation (bounded by
    * nBoot, not data — documented single partition). Driver state: none. */
  def poissonBootstrapMean(df: DataFrame, keyCol: Column, valueCol: Column,
      nBoot: Int = 100): DataFrame = {
    val base = df.select(keyCol.cast("string").as("k"),
      round(valueCol.cast("double") * 100.0).cast("long").as("cents"))
      .localCheckpoint() // feeds the point estimate + the replicate pass
    val point = base.agg(sum(col("cents")).cast(dec).as("s"),
      count(lit(1)).cast(dec).as("n"))
      .select((col("s").cast("double") / col("n").cast("double") / 100.0)
        .as("pm"))
    val u = graft.expressions.PortableHash
      .md5Hash60(concat(col("k"), lit("@"), col("b"))).cast("double") /
      lit(1152921504606846976.0) // 2^60
    val w = PoissonCdf.zipWithIndex.foldRight(lit(5L)) {
      case ((c, i), rest) => when(u < expr(s"CAST($c AS DOUBLE)"), i.toLong)
        .otherwise(rest)
    }
    val reps = base
      .select(col("k"), col("cents"),
        explode(sequence(lit(0), lit(nBoot - 1))).as("b"))
      .select(col("b"), col("cents"), w.as("w"))
      .groupBy("b")
      .agg(sum(col("w").cast(dec) * col("cents").cast(dec)).as("ws"),
        sum(col("w")).as("wc"))
      .where(col("wc") > 0)
      .select(col("b"), (col("ws").cast("double") /
        col("wc").cast("double") / 100.0).as("m"))
    // CI ranks derive from the SURVIVING replicate count, not the
    // nominal nBoot: zero-mass replicates are filtered above, and a
    // rank computed from nBoot would then name a row that does not
    // exist (hi silently NULL, bracket miscalibrated). With both an
    // ascending rank rk and a descending rank rd, every row knows the
    // survivor count as rk + rd − 1, so the ceil(n/20) bracket is one
    // self-contained predicate — no second pass.
    // domain-bounded window: nBoot bootstrap replicates
    val byMean = org.apache.spark.sql.expressions.Window
      .orderBy(col("m"), col("b")) // B rows: bounded by nBoot
    val byMeanDesc = org.apache.spark.sql.expressions.Window
      .orderBy(col("m").desc, col("b").desc)
    val ranked = reps.withColumn("rk", row_number().over(byMean))
      .withColumn("rd", row_number().over(byMeanDesc))
    val ci = ranked.agg(count(lit(1)).cast("long").as("n_boot"),
      max(when(expr("rk = (rk + rd + 18) div 20"), col("m"))).as("lo"),
      max(when(expr("rd = (rk + rd + 18) div 20"), col("m"))).as("hi"))
    ci.join(point)
      .select(col("n_boot"),
        (round(col("pm") * 10000.0) / 10000.0).as("point_mean"),
        (round(col("lo") * 10000.0) / 10000.0).as("lo90"),
        (round(col("hi") * 10000.0) / 10000.0).as("hi90"))
  }

  /** [[poissonBootstrapMean]] for a DIFFERENCE of means between the
    * `isGroup1` rows and the rest: the same deterministic md5-inverted
    * Poisson(1) draws resample BOTH groups jointly per replicate, the
    * replicate statistic is meanG1 − meanG2, and the 90% interval is
    * the order-statistic bracket — "does the gap survive resampling",
    * with zero RNG state and a replayable oracle. Replicates where
    * either group draws no mass are dropped (counted in n_boot).
    *
    * SCALE: one rows×B pass map-side-combined to B rows; B-row window. */
  def poissonBootstrapMeanDiff(df: DataFrame, keyCol: Column,
      valueCol: Column, isGroup1: Column, nBoot: Int = 100): DataFrame = {
    val base = df.select(keyCol.cast("string").as("k"),
      round(valueCol.cast("double") * 100.0).cast("long").as("cents"),
      when(isGroup1, 1L).otherwise(0L).as("g1"))
      .localCheckpoint()
    val point = base.agg(
      sum(when(col("g1") === 1, col("cents")).otherwise(0L)).cast(dec)
        .as("s1"),
      sum(col("g1")).cast(dec).as("n1"),
      sum(when(col("g1") === 0, col("cents")).otherwise(0L)).cast(dec)
        .as("s0"),
      (count(lit(1)) - sum(col("g1"))).cast(dec).as("n0"))
      .select(((col("s1").cast("double") / col("n1").cast("double") -
        col("s0").cast("double") / col("n0").cast("double")) / 100.0)
        .as("pd"))
    val u = graft.expressions.PortableHash
      .md5Hash60(concat(col("k"), lit("@"), col("b"))).cast("double") /
      lit(1152921504606846976.0)
    val w = PoissonCdf.zipWithIndex.foldRight(lit(5L)) {
      case ((c, i), rest) => when(u < expr(s"CAST($c AS DOUBLE)"), i.toLong)
        .otherwise(rest)
    }
    val reps = base
      .select(col("k"), col("cents"), col("g1"),
        explode(sequence(lit(0), lit(nBoot - 1))).as("b"))
      .select(col("b"), col("cents"), col("g1"), w.as("w"))
      .groupBy("b")
      .agg(sum(when(col("g1") === 1, col("w") * col("cents")).otherwise(0L)
          .cast(dec)).as("ws1"),
        sum(when(col("g1") === 1, col("w")).otherwise(0L)).as("wc1"),
        sum(when(col("g1") === 0, col("w") * col("cents")).otherwise(0L)
          .cast(dec)).as("ws0"),
        sum(when(col("g1") === 0, col("w")).otherwise(0L)).as("wc0"))
      .where(col("wc1") > 0 && col("wc0") > 0)
      .select(col("b"),
        ((col("ws1").cast("double") / col("wc1").cast("double") -
          col("ws0").cast("double") / col("wc0").cast("double")) / 100.0)
          .as("m"))
    // survivor-derived CI ranks — same rk/rd device as
    // [[poissonBootstrapMean]] (dropped replicates shrink the bracket
    // instead of NULLing its upper edge)
    // domain-bounded window: nBoot bootstrap replicates
    val byMean = org.apache.spark.sql.expressions.Window
      .orderBy(col("m"), col("b")) // B rows: bounded by nBoot
    val byMeanDesc = org.apache.spark.sql.expressions.Window
      .orderBy(col("m").desc, col("b").desc)
    val ranked = reps.withColumn("rk", row_number().over(byMean))
      .withColumn("rd", row_number().over(byMeanDesc))
    val ci = ranked.agg(count(lit(1)).cast("long").as("n_boot"),
      max(when(expr("rk = (rk + rd + 18) div 20"), col("m"))).as("lo"),
      max(when(expr("rd = (rk + rd + 18) div 20"), col("m"))).as("hi"))
    ci.join(point)
      .select(col("n_boot"),
        (round(col("pd") * 10000.0) / 10000.0).as("point_diff"),
        (round(col("lo") * 10000.0) / 10000.0).as("lo90"),
        (round(col("hi") * 10000.0) / 10000.0).as("hi90"))
  }

  /** Kendall's τ-b rank agreement between two metrics computed over the
    * same groups: concordant/discordant pair counts with the tie-
    * corrected denominator — "do these two rankings tell the same
    * story", robust to any monotone transform of either metric. Metrics
    * must be exact-integer ratios (engine and oracle then compare
    * IDENTICAL doubles, so C/D/tie counts are exact).
    *
    * SCALE: one corpus aggregation to the group table; the pair
    * comparison is a group²-sized broadcast BNLJ (model-sized). */
  def kendallTauB(groups: DataFrame, gCol: String, m1: Column,
      m2: Column): DataFrame = {
    val g = groups.select(col(gCol).as("g"), m1.as("x"), m2.as("y"))
    val pairs = g.as("a").join(broadcast(g.as("b")), col("a.g") < col("b.g"))
      .select((col("a.x") - col("b.x")).as("dx"),
        (col("a.y") - col("b.y")).as("dy"))
    val agg = pairs.agg(count(lit(1)).as("n_pairs"),
      sum(when(col("dx") =!= 0.0 && col("dy") =!= 0.0 &&
        (col("dx") > 0.0) === (col("dy") > 0.0), 1L).otherwise(0L)).as("c"),
      sum(when(col("dx") =!= 0.0 && col("dy") =!= 0.0 &&
        (col("dx") > 0.0) =!= (col("dy") > 0.0), 1L).otherwise(0L)).as("d"),
      sum(when(col("dx") === 0.0, 1L).otherwise(0L)).as("tx"),
      sum(when(col("dy") === 0.0, 1L).otherwise(0L)).as("ty"))
    agg.select(col("n_pairs").cast("long").as("n_pairs"),
      col("c").cast("long").as("concordant"),
      col("d").cast("long").as("discordant"),
      col("tx").cast("long").as("ties_x"), col("ty").cast("long").as("ties_y"),
      (round((col("c") - col("d")).cast("double") /
        sqrt((col("n_pairs") - col("tx")).cast("double") *
          (col("n_pairs") - col("ty")).cast("double")) * 1000000.0)
        / 1000000.0).as("tau_b"))
  }

  /** Spearman rank correlation between two metrics over the same
    * groups, tie-averaged ranks kept EXACT as doubled integers
    * (2·rank + ties − 1), Pearson composed from exact decimal rank
    * sums — [[kendallTauB]]'s magnitude-aware sibling.
    *
    * SCALE: ranks never exist per row here either — each metric's
    * doubled rank is a closed form of the DISTINCT-value tie counts and
    * their exclusive prefix (rank_min = cumB + 1, so 2·rank + t − 1 =
    * 2·cumB + t + 1), computed with the shared [[DistributedRank]]
    * two-phase prefix sum and joined back by value. No global-order
    * window anywhere: a value-typed metric domain (monetary cents,
    * generic longs — 10^8 distinct at corpus scale) stays parallel
    * instead of collapsing onto one task. */
  def spearmanRho(groups: DataFrame, gCol: String, m1: Column,
      m2: Column): DataFrame = {
    val g = groups.select(col(gCol).as("g"), m1.as("x"), m2.as("y"))
    def drankMap(c: String) = {
      val byV = g.groupBy(col(c).as("v")).agg(count(lit(1)).as("tv"))
      DistributedRank.prefixSum(byV, Nil, Seq(col("v")), Seq("tv" -> "cb"),
          inclusive = false)
        .select(col("v"), (lit(2L) * col("cb") + col("tv") + lit(1L)).as("dr"))
    }
    val rxd = drankMap("x").toDF("xv", "rx")
    val ryd = drankMap("y").toDF("yv", "ry")
    // null-safe equality: a null/NaN metric value still carries its rank,
    // exactly as the window form ranked it (asc_nulls_first order)
    val ranked = g.join(rxd, col("x") <=> col("xv"))
      .join(ryd, col("y") <=> col("yv"))
      .select(col("g"), col("rx"), col("ry"))
    val m = ranked.agg(count(lit(1)).cast(dec).as("n"),
      sum(col("rx")).cast(dec).as("sx"), sum(col("ry")).cast(dec).as("sy"),
      sum(col("rx").cast(dec) * col("rx").cast(dec)).as("sxx"),
      sum(col("ry").cast(dec) * col("ry").cast(dec)).as("syy"),
      sum(col("rx").cast(dec) * col("ry").cast(dec)).as("sxy"))
    val num = (col("n") * col("sxy") - col("sx") * col("sy")).cast("double")
    val vx = (col("n") * col("sxx") - col("sx") * col("sx")).cast("double")
    val vy = (col("n") * col("syy") - col("sy") * col("sy")).cast("double")
    m.select(col("n").cast("long").as("n_groups"),
      when(vx > 0.0 && vy > 0.0,
        round(num / sqrt(vx * vy) * 1000000.0) / 1000000.0)
        .as("spearman_rho"))
  }

  /** One-way ANOVA of `valueCol` across the groups of `groupCol`: the
    * between/within variance decomposition, F statistic, and effect size
    * η² — "does this partition of the corpus explain the metric". Values
    * must be integral-valued (counts/lengths) so the sufficient sums
    * n_g, S_g, Σv² are exact integers; SSB = Σ_g S_g²/n_g and the F/η²
    * chain run in doubles only in the final group-count-sized step.
    *
    * SCALE: one map-side-combined corpus aggregation to the group-sized
    * table, then a single-row fold over it. Output: 1 row. */
  def oneWayAnova(df: DataFrame, groupCol: Column,
      valueCol: Column): DataFrame = {
    val v = valueCol.cast("long")
    val perGroup = df.groupBy(groupCol.as("g"))
      .agg(count(lit(1)).cast(dec).as("n_g"), sum(v).cast(dec).as("s_g"),
        sum(v.cast(dec) * v.cast(dec)).as("ss_g"))
    val agg = perGroup.agg(
      count(lit(1)).cast(dec).as("k"), sum(col("n_g")).as("n"),
      sum(col("s_g")).as("s"), sum(col("ss_g")).as("ss"),
      // Σ_g S_g²/n_g in doubles: each term is one exact-integer ratio
      sum(col("s_g").cast("double") * col("s_g").cast("double") /
        col("n_g").cast("double")).as("sb"))
    val nD = col("n").cast("double")
    val kD = col("k").cast("double")
    val ssb = col("sb") - col("s").cast("double") * col("s").cast("double") / nD
    val sse = col("ss").cast("double") - col("sb")
    val sst = col("ss").cast("double") -
      col("s").cast("double") * col("s").cast("double") / nD
    agg.select(col("k").cast("long").as("k_groups"),
      col("n").cast("long").as("n_rows"),
      (round(ssb * 100.0) / 100.0).as("ssb"),
      (round(sse * 100.0) / 100.0).as("sse"),
      // ANSI Spark raises on x/0.0 even for doubles: a zero within-group
      // (or total) variance yields NULL, not a synthetic infinity
      when(sse > 0.0, round((ssb / (kD - 1.0)) / (sse / (nD - kD))
        * 1000000.0) / 1000000.0).as("f_stat"),
      when(sst > 0.0, round(ssb / sst * 1000000.0) / 1000000.0)
        .as("eta_sq"))
  }
}
