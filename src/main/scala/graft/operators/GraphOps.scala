package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Iterative graph algorithms expressed as declarative per-round plans —
  * the companion to [[Dedup.duplicateClusters]]'s label propagation for
  * graphs where the VALUE iterated is numeric mass, not a component id.
  */
object GraphOps {

  /** Weighted PageRank (Page et al. 1999, the simplified no-sink-
    * redistribution form) over an edge list (src, dst, w): rank_v =
    * (1-d)/N + d * Σ_{u→v} rank_u * w_uv / Σ_u w, run for a FIXED
    * `iterations` rounds so the result is deterministic and cross-engine
    * reproducible (convergence-threshold stopping would make the output
    * depend on float accumulation order). Dangling nodes keep their
    * teleport share but leak their damped mass, as in the classic
    * simplified formulation — callers who need the stochastic-matrix
    * variant can add a sink-redistribution term per round.
    *
    * SCALE: each round is ONE shuffle — contributions join ranks to the
    * normalized edges on src and aggregate on dst with map-side partial
    * combine; the node relation re-enters with a left join to restore
    * zero-in-degree nodes. Ranks are localCheckpoint'd per round so the
    * lineage (and a failure-recovery replay) stays one-round deep
    * instead of growing O(iterations) — the [[Dedup.duplicateClusters]]
    * argument. Edge normalization (out-weight division) happens ONCE
    * before the loop, not per round. The per-round rank relation is
    * node-sized; nothing is collected to the driver except the single
    * node COUNT that seeds the uniform prior. */
  def pageRank(edges: DataFrame, iterations: Int,
      damping: Double = 0.85): DataFrame = {
    val e = edges.select(col("src"), col("dst"), col("w").cast("double").as("w"))
    val outW = e.groupBy("src").agg(sum("w").as("ow"))
    val norm = e.join(outW, Seq("src"))
      .select(col("src"), col("dst"), (col("w") / col("ow")).as("p"))
      .localCheckpoint()
    val nodes = e.select(col("src").as("node"))
      .union(e.select(col("dst").as("node")))
      .distinct().localCheckpoint()
    val n = nodes.count()
    var ranks = nodes.select(col("node"), lit(1.0 / n).as("rank"))
      .localCheckpoint()
    for (_ <- 1 to iterations) {
      val contrib = norm.join(ranks, norm("src") === ranks("node"))
        .groupBy(col("dst").as("cnode"))
        .agg(sum(col("p") * col("rank")).as("c"))
      // LAZY checkpoint: each round's ranks has exactly ONE downstream
      // consumer (the next round), so the q71 double-execution argument
      // for eager materialization doesn't apply; deferring into the
      // consumer's job still truncates lineage and saves one job launch
      // per round (a small win here — the edge build dominates q113 —
      // but one that grows linearly with iteration count)
      ranks = nodes.join(contrib, nodes("node") === col("cnode"), "left")
        .select(col("node"),
          (lit((1.0 - damping) / n) +
            lit(damping) * coalesce(col("c"), lit(0.0))).as("rank"))
        .localCheckpoint(eager = false)
    }
    ranks
  }
}
