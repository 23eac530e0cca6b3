package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Order-statistics analytics: Pareto frontiers and inequality
  * (concentration) measures — the "which points/entities dominate"
  * reports layered over the plain top-k of q09/q57. */
object Ranking {

  /** 2-D Pareto frontier (skyline): the rows not dominated in the
    * maximize-(x, y) sense — p dominates q iff p ≥ q on both axes and
    * p > q on at least one. Duplicate (x, y) points collapse to the
    * first under the id tiebreak (a duplicate neither dominates nor is
    * dominated, but a frontier report wants each point once).
    *
    * Algorithm: the classic sort-sweep — order by (x DESC, y DESC),
    * keep a row iff its y strictly exceeds every preceding y. Run
    * TWICE: first within `shards` hash-shards of the id (each shard's
    * sweep discards its locally dominated rows — dominance within a
    * shard implies global dominance, so nothing a global frontier
    * needs is lost), then globally over the shard survivors.
    *
    * SCALE: the phase-1 window is shard-partitioned (no global sort of
    * the corpus); phase 2 sorts only the union of per-shard frontiers
    * — frontier-sized × shards, the classic distributed-skyline
    * shape. Exact integer/whatever-the-column-is comparisons — no
    * float composition at all. */
  def skyline2d(df: DataFrame, idCol: Column, xCol: Column, yCol: Column,
      shards: Int = 32): DataFrame = {
    val base = df.select(idCol.as("id"), xCol.as("x"), yCol.as("y"))
    def sweep(in: DataFrame, part: Seq[Column]): DataFrame = {
      val w = Window.partitionBy(part: _*)
        .orderBy(col("x").desc, col("y").desc, col("id"))
        .rowsBetween(Window.unboundedPreceding, -1)
      in.withColumn("_my", max(col("y")).over(w))
        .where(col("_my").isNull || col("y") > col("_my"))
        .drop("_my")
    }
    val local = sweep(base.withColumn("_sh", pmod(hash(col("id")), lit(shards))),
      Seq(col("_sh"))).drop("_sh")
    sweep(local, Seq.empty).orderBy(col("x").desc, col("y").desc)
  }

  /** Gini coefficient of a value's concentration within each group —
    * the inequality scalar (0 = uniform, →1 = one entity holds all)
    * that turns "revenue by customer" into "how concentrated is each
    * nation's revenue". Uses the rank formula over ascending values:
    * G = (2·Σᵢ i·vᵢ − (n+1)·Σv) / (n·Σv).
    *
    * Determinism: callers pass an INTEGER value column (quantize
    * currency to cents first); Σ i·v accumulates in decimal(38,0)
    * (i ≤ n, v unbounded — the product wraps a long at warehouse
    * scale), and Σ i·v over a run of tied values is invariant to
    * which tied row takes which rank, so the tiebreak cannot leak
    * into the result. One double division at the group-sized output.
    *
    * SCALE: one shuffle to rank within groups (group-sized windows,
    * keyed), one map-side-combined aggregation per group. */
  /** Generic basket co-occurrence: top-k unordered item pairs sharing a
    * group (order, session, document), with per-pair lift against the
    * item marginals — [[graft.operators.EventOps.sessionLift]]'s fold
    * without the sessionization, applicable to any (group, item)
    * relation (orders×parts, docs×entities).
    *
    * SCALE: presence dedups map-side to (group, item); the pair
    * self-join is group-keyed and emits ≤ basket² rows per group
    * (baskets are human-sized by assumption — document if not);
    * marginals and the group total re-enter as broadcasts; top-k cuts
    * with TakeOrderedAndProject on the exact pair count. */
  /** Frequent 3-itemsets by direct ordered triple join within each
    * basket (a < b < c — each triple found once), ranked by support with
    * full key tie-break. The [[cooccurrencePairs]] story one arity up:
    * the per-basket work is C(basket, 3), bounded by basket size, never
    * corpus² — the skew guard is the basket, not a global product. At
    * Apriori scale (huge baskets) prune with a frequent-pair semi-join
    * first; the testdata's basket sizes make the direct join exact and
    * cheaper. Exact integer supports — deterministic everywhere. */
  def frequentTriples(df: DataFrame, groupCol: Column, itemCol: Column,
      topK: Int = 15): DataFrame = {
    val pres = df.select(groupCol.as("g"), itemCol.as("i")).distinct()
      .localCheckpoint() // three-way self-join reads it thrice
    pres.select(col("g"), col("i").as("a"))
      .join(pres.select(col("g"), col("i").as("b")), Seq("g"))
      .where(col("a") < col("b"))
      .join(pres.select(col("g"), col("i").as("c")), Seq("g"))
      .where(col("b") < col("c"))
      .groupBy("a", "b", "c").agg(count(lit(1)).cast("long").as("support"))
      .orderBy(col("support").desc, col("a"), col("b"), col("c"))
      .limit(topK)
  }

  def cooccurrencePairs(df: DataFrame, groupCol: Column, itemCol: Column,
      topK: Int = 20): DataFrame = {
    val pres = df.select(groupCol.as("g"), itemCol.as("i")).distinct()
    val tot = pres.select("g").distinct().agg(count(lit(1)).as("ng"))
    val singles = pres.groupBy("i").agg(count(lit(1)).as("ni"))
    val pairs = pres.select(col("g"), col("i").as("ia"))
      .join(pres.select(col("g"), col("i").as("ib")), Seq("g"))
      .where(col("ia") < col("ib"))
      .groupBy("ia", "ib").agg(count(lit(1)).as("n_ab"))
      .orderBy(col("n_ab").desc, col("ia"), col("ib")).limit(topK)
    pairs
      .join(broadcast(singles.select(col("i").as("ia"), col("ni").as("na"))), "ia")
      .join(broadcast(singles.select(col("i").as("ib"), col("ni").as("nb"))), "ib")
      .join(broadcast(tot))
      .select(col("ia"), col("ib"), col("n_ab"), col("na"), col("nb"),
        (round(col("n_ab").cast("double") * col("ng").cast("double") /
          (col("na").cast("double") * col("nb").cast("double"))
          * 1000000.0) / 1000000.0).as("lift"))
      .orderBy(col("n_ab").desc, col("ia"), col("ib"))
  }

  /** Reciprocal-rank fusion (Cormack, Clarke & Büttcher, SIGIR '09) of
    * several ranked retrieval lists: each list contributes
    * 1/(k + rank) per id, sums fused, top-k re-ranked — the robust,
    * score-scale-free way to merge lexical (BM25) and dense
    * (embedding) retrieval.
    *
    * Inputs are (id, score) lists ALREADY cut to per-list top-k (the
    * retrieval contract — list-sized, not corpus-sized); ranks are
    * assigned here by (score DESC, id), so callers pass display-
    * rounded scores (both engines agree on those) and the integer
    * ranks — hence the fused sums — are engine-exact. With two lists
    * the fusion sum is a single commutative IEEE addition; ordering
    * uses the ROUNDED fused score with an id tiebreak.
    *
    * SCALE: everything after retrieval is list-sized; the per-list
    * rank windows are bounded by the list cut. */
  def rrfFuse(rankings: Seq[DataFrame], kRrf: Int = 60,
      topK: Int = 20): DataFrame = {
    require(rankings.nonEmpty)
    val ranked = rankings.map { df =>
      val w = Window.orderBy(col("score").desc, col("id"))
      df.select(col("id"), col("score"))
        .withColumn("r", row_number().over(w).cast("long"))
        .select(col("id"), (lit(1.0) /
          (lit(kRrf.toDouble) + col("r").cast("double"))).as("contrib"))
    }
    ranked.reduce(_ unionAll _)
      .groupBy("id")
      .agg(count(lit(1)).as("n_lists"),
        (round(sum(col("contrib")) * 1000000.0) / 1000000.0).as("rrf"))
      .orderBy(col("rrf").desc, col("id")).limit(topK)
      .select(col("id"), col("n_lists"), col("rrf"))
  }

  def giniConcentration(df: DataFrame, gCol: String, vCol: String): DataFrame = {
    val dec = org.apache.spark.sql.types.DecimalType(38, 0)
    val byG = Window.partitionBy(gCol).orderBy("v")
    val ranked = df.select(col(gCol), col(vCol).cast("long").as("v"))
      .withColumn("i", row_number().over(byG).cast("long"))
    val agg = ranked.groupBy(gCol).agg(
      count(lit(1)).as("n"), sum(col("v")).cast(dec).as("sv"),
      sum(col("i").cast(dec) * col("v").cast(dec)).as("siv"))
    val num = (lit(2L).cast(dec) * col("siv") -
      (col("n") + 1L).cast(dec) * col("sv")).cast("double")
    val den = (col("n").cast(dec) * col("sv")).cast("double")
    agg.select(col(gCol), col("n"), col("sv").cast("long").as("total"),
      when(col("sv") =!= 0,
        round(num / den * 1000000.0) / 1000000.0).as("gini"))
      .orderBy(gCol)
  }
}
