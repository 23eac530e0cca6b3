package graft.operators

import org.apache.spark.sql.{Column, DataFrame, Row, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{LongType, StringType, StructField, StructType}

/** One-pass table profiling: the per-column data-quality report
  * (non-null count, exact distinct count, min, max) every ingest gate
  * wants before accepting a drop.
  *
  * SCALE: ONE aggregation over ONE scan — all columns' aggregates ride
  * the same pass (the multi-distinct plans through Catalyst's Expand,
  * still a single scan + one shuffle), and the only driver-side state is
  * the single result row pivoted to per-column rows — bounded by the
  * COLUMN count, never by data. Min/max surface as strings so one report
  * schema covers any table. */
object Profiling {

  def profile(df: DataFrame): DataFrame = {
    val spark = df.sparkSession
    val fields = df.schema.fields
    val aggs = fields.zipWithIndex.flatMap { case (f, i) =>
      Seq(count(col(f.name)).as(s"nn_$i"),
        count_distinct(col(f.name)).as(s"nd_$i"),
        min(col(f.name)).cast("string").as(s"mn_$i"),
        max(col(f.name)).cast("string").as(s"mx_$i"))
    }
    val row = df.agg(aggs.head, aggs.tail: _*).head()
    val out = fields.zipWithIndex.map { case (f, i) =>
      Row(f.name, f.dataType.simpleString,
        row.getAs[Long](s"nn_$i"), row.getAs[Long](s"nd_$i"),
        row.getAs[String](s"mn_$i"), row.getAs[String](s"mx_$i"))
    }
    spark.createDataFrame(
      spark.sparkContext.parallelize(out.toSeq, 1),
      StructType(Seq(
        StructField("column", StringType, nullable = false),
        StructField("dtype", StringType, nullable = false),
        StructField("n_notnull", LongType, nullable = false),
        StructField("n_distinct", LongType, nullable = false),
        StructField("min_s", StringType, nullable = true),
        StructField("max_s", StringType, nullable = true))))
  }

  /** Profile drift between two snapshots of the same schema: one row per
    * column with both sides' statistics and a `stable` verdict (equal
    * distinct counts AND equal min/max bounds — null-safe). The
    * before/after ingest audit: a column whose bounds or cardinality
    * moved is where the new drop changed shape. Cost = the two one-pass
    * profiles plus a column-count-sized join. */
  def profileDrift(before: DataFrame, after: DataFrame): DataFrame = {
    val a = profile(before).select(col("column"), col("dtype"),
      col("n_notnull").as("nn_a"), col("n_distinct").as("nd_a"),
      col("min_s").as("min_a"), col("max_s").as("max_a"))
    val b = profile(after).select(col("column"),
      col("n_notnull").as("nn_b"), col("n_distinct").as("nd_b"),
      col("min_s").as("min_b"), col("max_s").as("max_b"))
    a.join(b, Seq("column"))
      .withColumn("stable",
        col("nd_a") === col("nd_b") &&
          col("min_a") <=> col("min_b") && col("max_a") <=> col("max_b"))
  }

  /** Exact per-group median via WINDOW RANK selection, not an in-memory
    * percentile buffer: rank each group's values with a sort-based
    * window (spillable — state per task is the sort run, never a
    * group-sized array, unlike `percentile()` whose aggregation buffer
    * holds every value of the group), then average the one or two
    * middle values. Engine-portable: the middle-pair mean is the same
    * (a+b)/2 DuckDB's `median`/`quantile_cont(0.5)` computes.
    *
    * SCALE: one shuffle by group for the window, one map-side-combined
    * aggregation of the ≤2 selected rows per group. */
  def groupMedian(df: DataFrame, gCol: String, xCol: String): DataFrame = {
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(gCol).orderBy(col(xCol))
    df.select(col(gCol), col(xCol))
      .withColumn("__rn", row_number().over(w))
      .withColumn("__n", count(lit(1)).over(
        org.apache.spark.sql.expressions.Window.partitionBy(gCol)))
      .where(col("__rn") === expr("(__n + 1) div 2") ||
        col("__rn") === expr("(__n + 2) div 2"))
      .groupBy(gCol).agg(avg(col(xCol)).as("med"))
  }

  /** Exact NEAREST-RANK percentiles per group (P50/P90/P99-style bands):
    * rank each group's values with a spillable sort window and select
    * the value at rank ⌈p·n⌉ for every requested p — pure selection, no
    * interpolation arithmetic, so the band values are corpus values and
    * cross-engine identical. The latency/size-profile shape every ops
    * dashboard wants. Same scale argument as [[groupMedian]]: state is
    * the sort run, never a group-sized buffer.
    *
    * Ties on the value are harmless: ranks within a tie are arbitrary
    * but every rank in the tie holds the SAME value, and selection is
    * by value. */
  def rankPercentiles(df: DataFrame, gCol: String, xCol: String,
      ps: Seq[Double]): DataFrame = {
    require(ps.nonEmpty && ps.forall(p => p > 0 && p <= 1.0))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(gCol).orderBy(col("__x"))
    val ranked = df.select(col(gCol), col(xCol).as("__x"))
      .withColumn("__rn", row_number().over(w))
      .withColumn("__n", count(lit(1)).over(
        org.apache.spark.sql.expressions.Window.partitionBy(gCol)))
    val bands = ps.map(p => max(when(
      col("__rn") === ceil(lit(p) * col("__n")), col("__x")))
      .as("p" + math.round(p * 100)))
    ranked.groupBy(gCol)
      .agg(max(col("__n")).as("n"), bands: _*)
  }

  /** Exact ROC AUC by the Mann-Whitney rank identity with midrank tie
    * handling: group rows by distinct score (ties collapse to one row),
    * run one cumulative-count window over the score order, and fold
    * AUC = (Σ_pos midrank − n⁺(n⁺+1)/2) / (n⁺·n⁻). All terms are
    * integers and exact halves — exact doubles far past any evaluation
    * set size, so the statistic is partition- and engine-invariant
    * (no trapezoid sweep, no floating accumulation).
    *
    * SCALE: the cumulative window is a GLOBAL order over the DISTINCT
    * scores — evaluation-set statistic by design (the q178 argument);
    * the grouping pass itself is map-side combinable. */
  def rocAuc(scored: DataFrame, labelCol: String = "y",
      scoreCol: String = "score"): DataFrame = {
    // evaluation-set statistic by design (see scaladoc): the score order is a held-out-sample domain, not a corpus one
    val byScore = org.apache.spark.sql.expressions.Window
      .orderBy(col(scoreCol))
      .rowsBetween(org.apache.spark.sql.expressions.Window.unboundedPreceding,
        org.apache.spark.sql.expressions.Window.currentRow)
    scored.groupBy(col(scoreCol))
      .agg(count(lit(1)).as("c"), sum(col(labelCol).cast("long")).as("cp"))
      .withColumn("run", sum(col("c")).over(byScore))
      .select((col("cp").cast("double") *
          ((col("run") - col("c")).cast("double") +
            (col("c").cast("double") + 1.0) / 2.0)).as("contrib"),
        col("cp"), col("c"))
      .agg(sum("contrib").as("spos"), sum("cp").as("np"),
        (sum("c") - sum("cp")).as("nn"))
      .select(col("np"), col("nn"),
        (round((col("spos") - col("np").cast("double") *
          (col("np").cast("double") + 1.0) / 2.0) /
          (col("np").cast("double") * col("nn").cast("double")) * 1000000.0)
          / 1000000.0).as("auc"))
  }

  /** Robust per-group outlier profile: median, MAD (median absolute
    * deviation), and the count of values outside med ± k·MAD — the
    * robust-statistics alternative to mean/stddev gates (one corrupt
    * extreme value shifts a z-score gate; it leaves med/MAD untouched).
    * Both medians use [[groupMedian]]'s rank-selection form.
    *
    * SCALE: three passes over the (group, x) projection — two window
    * medians and one outlier count — every one keyed on the group;
    * the model-sized median tables re-enter as broadcasts. */
  def madOutliers(df: DataFrame, gCol: String, xCol: String,
      k: Double = 3.0): DataFrame = {
    val base = df.select(col(gCol), col(xCol).cast("double").as("x"))
    val med = groupMedian(base, gCol, "x")
    val dev = base.join(broadcast(med), Seq(gCol))
      .withColumn("ad", abs(col("x") - col("med")))
    val mad = groupMedian(dev.select(col(gCol), col("ad")), gCol, "ad")
      .withColumnRenamed("med", "mad")
    dev.join(broadcast(mad), Seq(gCol))
      .groupBy(gCol)
      .agg(count(lit(1)).as("n"),
        max(col("med")).as("med"), max(col("mad")).as("mad"),
        sum(when(col("ad") > lit(k) * col("mad"), 1L).otherwise(0L))
          .as("n_outliers"))
  }

  /** Exact two-sample Kolmogorov–Smirnov statistic between the
    * distributions of an integer-valued column in two populations —
    * the distribution-free drift gate (did this source's length/score
    * distribution move?) that madOutliers' point-wise test can't see.
    *
    * D = max over values v of |F₁(v) − F₂(v)|. The argmax is taken on
    * the EXACT integer numerator |c₁(v)·n₂ − c₂(v)·n₁| (cumulative
    * counts cross-scaled instead of divided), so the winning value is
    * identical on any engine — no float-ordering hazard; the statistic
    * itself is one double division at the single-row output, display-
    * rounded. Ties break to the smallest value.
    *
    * SCALE: the per-population counts aggregate map-side to one row per
    * DISTINCT value — the cumulative window then runs over that
    * domain-sized table (an integer measurement domain, e.g. doc
    * lengths, is bounded regardless of corpus size), not over rows.
    * The single-partition window is domain-sized by construction and
    * documented as such. */
  /** Weighted nearest-rank quantiles per group: the smallest value v
    * whose cumulative WEIGHT reaches p·W — e.g. token-weighted document
    * length percentiles ("the median token lives in docs this long"),
    * where the unweighted [[rankPercentiles]] would report the median
    * DOCUMENT instead. Boundaries are corpus values; the comparison
    * cumw ≥ p·W pits an exact integer (cast double) against one
    * product — engine-exact.
    *
    * SCALE: value-keyed weight aggregation first (map-side combined,
    * domain-sized), then the shared [[DistributedRank]] keyed two-phase
    * prefix sum over the distinct values — no per-group ordered window,
    * so an unbounded value domain never lands on a single task. */
  def weightedQuantiles(df: DataFrame, gCol: String, xCol: String,
      wCol: String, ps: Seq[Double]): DataFrame = {
    require(ps.nonEmpty && ps.forall(p => p > 0 && p <= 1.0))
    val byV = df.select(col(gCol), col(xCol).cast("long").as("x"),
        col(wCol).cast("long").as("w"))
      .groupBy(gCol, "x").agg(sum(col("w")).as("w"))
    // keyed two-phase prefix (group keys driver-bounded; the per-group
    // distinct-VALUE domain is not): a group whose value domain reaches
    // 10^8 spans range partitions instead of collapsing onto the one
    // task a group-partitioned ordered window would give it. The grand
    // totals ride the same pass — no second window, no extra shuffle.
    val cum = DistributedRank.prefixSum(byV, Seq(gCol), Seq(col("x")),
      Seq("w" -> "cumw"), inclusive = true, totals = Seq("w" -> "tw"))
    val bands = ps.map(p => min(when(
      col("cumw").cast("double") >= lit(p) * col("tw").cast("double"),
      col("x"))).as("wp" + math.round(p * 100)))
    cum.groupBy(gCol)
      .agg(max(col("tw")).as("total_weight"), bands: _*)
      .orderBy(gCol)
  }

  /** Decile gains table for a scored binary classifier: rows ranked by
    * score (ties broken by id for a total order), cut into 10 equal-
    * count bands by nearest rank, each reporting its positive count,
    * rate, and the cumulative capture of all positives — the marketing
    * "gains chart" / model-lift view that P-R curves (q183) don't give.
    *
    * Determinism: band assignment is ceil(10·rank/n) on exact integers
    * (the nearest-rank convention); everything downstream is exact
    * counts; rates are single divisions at the 10-row output.
    *
    * SCALE: one global rank over the SCORED EVALUATION SET (eval-sized
    * by contract, the q186 argument), then 10-row work. */
  def gainsTable(scored: DataFrame, labelCol: String = "y",
      scoreCol: String = "score", idCol: String = "doc_id"): DataFrame = {
    val w = org.apache.spark.sql.expressions.Window
      .orderBy(col(scoreCol).desc, col(idCol))
    val n = org.apache.spark.sql.expressions.Window
      .partitionBy(lit(1))
    val ranked = scored
      .select(col(idCol), col(labelCol).cast("long").as("yy"),
        col(scoreCol))
      .withColumn("rnk", row_number().over(w).cast("long"))
      .withColumn("nn", count(lit(1)).over(n))
    val banded = ranked
      .select(ceil(lit(10L) * col("rnk") / col("nn")).cast("long")
        .as("decile"), col("yy"))
      .groupBy("decile")
      .agg(count(lit(1)).as("n"), sum(col("yy")).as("positives"))
    val totPos = banded.agg(sum(col("positives")).as("tp"))
    // domain-bounded window: 10 deciles
    val cw = org.apache.spark.sql.expressions.Window.orderBy("decile")
      .rowsBetween(org.apache.spark.sql.expressions.Window.unboundedPreceding, 0)
    banded.withColumn("cum_pos", sum(col("positives")).over(cw))
      .join(broadcast(totPos))
      .select(col("decile"), col("n"), col("positives"),
        (round(col("positives").cast("double") / col("n").cast("double")
          * 1000000.0) / 1000000.0).as("rate"),
        (round(col("cum_pos").cast("double") / col("tp").cast("double")
          * 1000000.0) / 1000000.0).as("cum_capture"))
      .orderBy("decile")
  }

  /** Cohen's kappa between two categorical columns (rater A vs rater B
    * — a model's predictions vs labels, or two models): agreement
    * corrected for chance, κ = (p_o − p_e)/(1 − p_e) with p_e from the
    * marginal products. The single scalar that says whether q184's
    * confusion matrix is better than a majority-class coin.
    *
    * Determinism: all cells/marginals exact integers; Σ n_a·n_b
    * accumulates in decimal(38,0); p_o, p_e and κ are a fixed IEEE
    * chain at the single-row output.
    *
    * SCALE: two map-side-combined label-domain-sized aggregations over
    * one projection; marginal join at label-domain size. */
  def cohenKappa(df: DataFrame, aCol: org.apache.spark.sql.Column,
      bCol: org.apache.spark.sql.Column): DataFrame = {
    val dec = org.apache.spark.sql.types.DecimalType(38, 0)
    val base = df.select(aCol.as("a"), bCol.as("b"))
    val ma = base.groupBy("a").agg(count(lit(1)).as("na"))
    val mb = base.groupBy("b").agg(count(lit(1)).as("nb"))
    val diag = base.agg(count(lit(1)).as("n"),
      sum(when(col("a") === col("b"), 1L).otherwise(0L)).as("agree"))
    val pe = ma.join(mb, col("a") === col("b"))
      .agg(sum(col("na").cast(dec) * col("nb").cast(dec)).as("sab"))
    val po = col("agree").cast("double") / col("n").cast("double")
    val peD = col("sab").cast("double") /
      (col("n").cast("double") * col("n").cast("double"))
    diag.join(broadcast(pe))
      .select(col("n"), col("agree"),
        (round(po * 1000000.0) / 1000000.0).as("po"),
        (round(peD * 1000000.0) / 1000000.0).as("pe"),
        (round((po - peD) / (lit(1.0) - peD) * 1000000.0) / 1000000.0)
          .as("kappa"))
  }

  /** Join-key heavy-hitter report: the top-k keys of a prospective
    * join/grouping column with each key's frequency share and the
    * running cumulative share — the skew pre-check that says whether a
    * plain hash join will hotspot (pair with the q82 salted join when
    * the head share is large).
    *
    * SCALE: one map-side-combined count to a key-domain-sized table,
    * TakeOrderedAndProject top-k cut, then windows over k rows only;
    * the total re-enters as a single-row broadcast. */
  def heavyHitters(df: DataFrame, keyCol: String, topK: Int = 20): DataFrame = {
    val counts = df.groupBy(col(keyCol).as("key"))
      .agg(count(lit(1)).as("n"))
    val tot = counts.agg(sum(col("n")).as("nt"))
    val top = counts.orderBy(col("n").desc, col("key")).limit(topK)
    val w = org.apache.spark.sql.expressions.Window
      .orderBy(col("n").desc, col("key"))
    top.join(broadcast(tot))
      .withColumn("rank", row_number().over(w).cast("long"))
      .withColumn("cum_n", sum(col("n")).over(
        w.rowsBetween(org.apache.spark.sql.expressions.Window.unboundedPreceding, 0)))
      .select(col("rank"), col("key"), col("n"),
        (round(col("n").cast("double") / col("nt").cast("double")
          * 1000000.0) / 1000000.0).as("share"),
        (round(col("cum_n").cast("double") / col("nt").cast("double")
          * 1000000.0) / 1000000.0).as("cum_share"))
      .orderBy("rank")
  }

  /** Winsorized + trimmed robust means per group: clamp (winsorize) or
    * drop (trim) values outside the nearest-rank [lo, hi] percentile
    * band before averaging — the tail-insensitive mean pair that
    * complements [[madOutliers]]' outlier COUNT with a robust LEVEL.
    *
    * Determinism: band boundaries are corpus VALUES (nearest-rank
    * selection, exact); clamped/trimmed sums are exact integer sums of
    * an integer column; the means are one double division each at the
    * group-sized output.
    *
    * SCALE: one ranked window pass for the boundaries
    * ([[rankPercentiles]]), boundaries re-enter as a broadcast, then
    * one map-side-combined aggregation over the scan. */
  def winsorizedStats(df: DataFrame, gCol: String, xCol: String,
      lo: Double = 0.1, hi: Double = 0.9): DataFrame = {
    val base = df.select(col(gCol), col(xCol).cast("long").as("x"))
    val bands = rankPercentiles(base, gCol, "x", Seq(lo, hi))
    val pLo = "p" + math.round(lo * 100)
    val pHi = "p" + math.round(hi * 100)
    val clamped = least(greatest(col("x"), col(pLo)), col(pHi))
    val inBand = col("x") >= col(pLo) && col("x") <= col(pHi)
    base.join(broadcast(bands), Seq(gCol))
      .groupBy(gCol)
      .agg(count(lit(1)).as("n"),
        (round(sum(col("x")).cast("double") / count(lit(1)).cast("double")
          * 1000000.0) / 1000000.0).as("mean"),
        (round(sum(clamped).cast("double") / count(lit(1)).cast("double")
          * 1000000.0) / 1000000.0).as("winsorized_mean"),
        (round(sum(when(inBand, col("x")).otherwise(lit(0L))).cast("double")
          / sum(when(inBand, 1L).otherwise(0L)).cast("double")
          * 1000000.0) / 1000000.0).as("trimmed_mean"))
      .orderBy(gCol)
  }

  /** Benford's-law first-digit profile of a positive currency column —
    * the classic fabricated-data screen: natural multiplicative data
    * follows P(d) = log₁₀(1 + 1/d); a flat or spiked digit histogram
    * flags synthetic or tampered values. Values are quantized to cents
    * first so the leading digit comes from an exact INTEGER's decimal
    * string — identical on any engine — never from float log/division.
    *
    * Output: per digit 1–9, the count, observed fraction, expected
    * Benford fraction, and the signed deviation (obs − exp), all
    * display-rounded.
    *
    * SCALE: one map-side-combined pass to a 9-row table; the total
    * re-enters as a single-row broadcast. */
  def benford(df: DataFrame, valueCol: org.apache.spark.sql.Column): DataFrame = {
    val cents = round(valueCol.cast("double") * lit(100.0)).cast("long")
    val digits = df.select(cents.as("cents")).where(col("cents") >= 1L)
      .select(substring(col("cents").cast("string"), 1, 1).cast("long")
        .as("digit"))
      .groupBy("digit").agg(count(lit(1)).as("n"))
    val tot = digits.agg(sum(col("n")).as("nt"))
    val obs = col("n").cast("double") / col("nt").cast("double")
    val exp10 = log(lit(1.0) + lit(1.0) / col("digit").cast("double")) /
      log(lit(10.0))
    digits.join(broadcast(tot))
      .select(col("digit"), col("n"),
        (round(obs * 1000000.0) / 1000000.0).as("obs_frac"),
        (round(exp10 * 1000000.0) / 1000000.0).as("exp_frac"),
        (round((obs - exp10) * 1000000.0) / 1000000.0).as("deviation"))
      .orderBy("digit")
  }

  def ksDrift(df: DataFrame, valueCol: String,
      inGroup1: org.apache.spark.sql.Column): DataFrame = {
    val g = df.select(col(valueCol).cast("long").as("v"),
      inGroup1.cast("long").as("g"))
    val byV = g.groupBy("v")
      .agg(sum(col("g")).as("c1"), sum(lit(1L) - col("g")).as("c2"))
    val tot = g.agg(sum(col("g")).as("n1"), sum(lit(1L) - col("g")).as("n2"))
    // both ECDFs in ONE shared two-phase prefix pass over the distinct
    // values — a value-typed domain (monetary cents, generic longs) is
    // NOT calendar-bounded, so the former global cumulative window would
    // put 10^8 distinct values on one task at corpus scale
    DistributedRank.prefixSum(byV, Nil, Seq(col("v")),
        Seq("c1" -> "cum1", "c2" -> "cum2"), inclusive = true)
      .join(broadcast(tot))
      .withColumn("num", abs(col("cum1") * col("n2") - col("cum2") * col("n1")))
      .orderBy(col("num").desc, col("v"))
      .limit(1)
      .select(col("v").as("at_value"), col("n1"), col("n2"),
        (round(col("num").cast("double") /
          (col("n1") * col("n2")).cast("double") * 1000000.0) / 1000000.0)
          .as("d_stat"))
  }

  /** Declarative data-contract gate (the Great-Expectations shape as a
    * relational program): every ROW rule is a boolean column evaluated
    * in ONE conditional-sum aggregation pass over the table — adding a
    * rule adds a projection column, never a scan — and each UNIQUENESS
    * contract is one count-vs-count-distinct aggregate in the same
    * pass. Output: one row per rule (rule, n_rows, n_violations,
    * passed), the table an ingest gate either blocks on or publishes.
    *
    * Exact integer counts — deterministic everywhere. SCALE: one
    * map-side-combined pass regardless of rule count; the per-rule
    * unpivot happens on the 1-row aggregate. */
  def expectations(df: DataFrame,
      rowRules: Seq[(String, org.apache.spark.sql.Column)],
      uniqueCols: Seq[String] = Nil): DataFrame = {
    val rowAggs = rowRules.map { case (n, c) =>
      sum(when(c, 0L).otherwise(1L)).as(s"__v_$n")
    }
    val uniqAggs = uniqueCols.map(c =>
      (count(lit(1)) - countDistinct(col(c))).as(s"__u_$c"))
    val aggs = rowAggs ++ uniqAggs :+ count(lit(1)).as("__n")
    val one = df.agg(aggs.head, aggs.tail: _*)
    val entries = rowRules.map { case (n, _) =>
      struct(lit(n).as("rule"), col(s"__v_$n").as("v"))
    } ++ uniqueCols.map(c =>
      struct(lit(s"unique($c)").as("rule"), col(s"__u_$c").as("v")))
    one.select(col("__n"), explode(array(entries: _*)).as("e"))
      .select(col("e.rule").as("rule"), col("__n").cast("long").as("n_rows"),
        col("e.v").cast("long").as("n_violations"),
        (col("e.v") === 0).as("passed"))
  }

  /** Entropy-regularized optimal transport (Sinkhorn-Knopp) between two
    * binned distributions of `valueCol` — the geometry-aware drift
    * metric between KS (sup-norm), PSI (binwise) and raw W₁ (q332): a
    * smoothed transport cost that a few dozen scaling rounds compute in
    * closed iteration. Histograms bin at `binWidth`; the Gibbs kernel
    * K_ij = round₆(exp(−|i−j|/λ)) is the ONLY transcendental and is
    * quantized cell-wise (the q378 exp convention); the u/v scaling
    * vectors quantize to 1e-9 every round (q240 discipline — bin-sized
    * sums drift ~1e-15, five orders under the quantum), so all `rounds`
    * rounds are reproducible cross-engine.
    *
    * SCALE: the corpus work is ONE binned count aggregation; the
    * iteration runs driver-side on the bin-sized model (support is
    * value-range/binWidth — the q205 histogram contract). */
  def sinkhornDistance(df: DataFrame, valueCol: String, splitCol: Column,
      binWidth: Long = 25L, lambda: Double = 5.0,
      rounds: Int = 20): DataFrame = {
    val spark = df.sparkSession
    import spark.implicits._
    // NULL split OR value cells carry no mass and are dropped BEFORE
    // the collect (getBoolean/getLong on a null cell would NPE); an
    // empty side has no transport plan, so fail loudly instead of
    // dividing 0/0 into a NaN cost.
    val hist = df.where(splitCol.isNotNull && col(valueCol).isNotNull)
      .select((col(valueCol) / binWidth).cast("long").as("bin"),
        splitCol.as("g"))
      .groupBy("bin", "g").agg(count(lit(1)).as("c"))
      .collect().map(r => (r.getLong(0), r.getBoolean(1), r.getLong(2)))
    val aBins = hist.filter(_._2).map(t => (t._1, t._3)).sortBy(_._1)
    val bBins = hist.filterNot(_._2).map(t => (t._1, t._3)).sortBy(_._1)
    val (na, nb) = (aBins.map(_._2).sum, bBins.map(_._2).sum)
    require(na > 0 && nb > 0,
      s"sinkhornDistance needs both split sides nonempty (a=$na b=$nb)")
    val a = aBins.map(t => t._2.toDouble / na)
    val b = bBins.map(t => t._2.toDouble / nb)
    def q6(x: Double) = math.round(x * 1e6) / 1e6
    def q9(x: Double) = math.round(x * 1e9) / 1e9
    val k = Array.tabulate(a.length, b.length)((i, j) =>
      q6(math.exp(-math.abs(aBins(i)._1 - bBins(j)._1).toDouble / lambda)))
    var u = a.map(_ => 1.0)
    var v = b.map(_ => 1.0)
    for (_ <- 1 to rounds) {
      u = Array.tabulate(a.length) { i =>
        var s = 0.0; var j = 0
        while (j < b.length) { s += k(i)(j) * v(j); j += 1 }
        q9(a(i) / s)
      }
      v = Array.tabulate(b.length) { j =>
        var s = 0.0; var i = 0
        while (i < a.length) { s += k(i)(j) * u(i); i += 1 }
        q9(b(j) / s)
      }
    }
    var cost = 0.0
    for (i <- a.indices; j <- b.indices)
      cost += u(i) * k(i)(j) * v(j) *
        math.abs(aBins(i)._1 - bBins(j)._1).toDouble
    Seq((a.length.toLong, b.length.toLong,
        math.round(cost * 1e4) / 1e4.toDouble))
      .toDF("n_bins_a", "n_bins_b", "sinkhorn_cost")
  }
}
