package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** TextRank keyword extraction (Mihalcea & Tarau 2004): per-document
  * PageRank over the adjacent-token co-occurrence graph, every document
  * iterated SIMULTANEOUSLY — the per-doc graphs are disjoint keys of one
  * (doc_id, word) relation, so N documents cost the same join-aggregate
  * program as one.
  *
  * Determinism: ranks live in integer millionths. Each round a node
  * emits floor(rank/deg) to every neighbor (exact integer division),
  * the sums are exact decimal integers, and the damped update
  * round((1-d)·10⁶ + d·Σ) multiplies an exact integer by the literal
  * 0.85 — one correctly-rounded double op, identical across engines.
  * The float-PageRank variant would compound agg-order ulps per round;
  * this one is bit-stable under any partitioning.
  */
object TextRank {

  private val dec = org.apache.spark.sql.types.DecimalType(38, 0)

  /** Top-`topK` keywords per document after `rounds` damped iterations
    * (d = 0.85). Edges: distinct unordered adjacent-token pairs; nodes
    * with no edges (single-token docs) are absent by construction.
    *
    * SCALE: tokenize+pair is one scan-speed projection; every round is
    * ONE (doc_id, word)-keyed join + one map-side-combined sum over the
    * symmetrized edge relation (checkpointed once, loop-invariant);
    * rank state is (doc_id, word)-sized and eagerly checkpointed with
    * the superseded round released ([[GraphOps.pageRank]] discipline).
    * The final cut is a per-doc WindowGroupLimit top-K. */
  def keywords(docs: DataFrame, rounds: Int, topK: Int): DataFrame = {
    val toks = docs.select(col("doc_id"), split(col("text"), " ").as("t"))
    val pairs = toks.select(col("doc_id"),
      explode(expr(
        "zip_with(slice(t, 1, size(t) - 1), slice(t, 2, size(t) - 1)," +
          " (a, b) -> struct(a, b))")).as("p"))
      .select(col("doc_id"),
        least(col("p.a"), col("p.b")).as("wa"),
        greatest(col("p.a"), col("p.b")).as("wb"))
      .where(col("wa") =!= col("wb")).distinct()
    val sym = pairs.select(col("doc_id"), col("wa").as("u"), col("wb").as("v"))
      .union(pairs.select(col("doc_id"), col("wb").as("u"), col("wa").as("v")))
      .localCheckpoint()
    val deg = sym.groupBy("doc_id", "u").agg(count(lit(1)).as("deg"))
      .localCheckpoint()
    var rank = deg.select(col("doc_id"), col("u").as("w"),
      lit(1000000L).as("r")).localCheckpoint()
    for (_ <- 1 to rounds) {
      val contrib = sym
        .join(deg, Seq("doc_id", "u"))
        .join(rank.select(col("doc_id"), col("w").as("u"), col("r")),
          Seq("doc_id", "u"))
        .groupBy(col("doc_id"), col("v").as("w"))
        .agg(sum(expr("r div deg").cast(dec)).as("c")) // exact int division
      val next = contrib.select(col("doc_id"), col("w"),
        round(lit(150000.0) +
          lit(0.85) * col("c").cast("double")).cast("long").as("r"))
        .localCheckpoint()
      IterUtils.unpersistCheckpoint(rank)
      rank = next
    }
    val byDoc = org.apache.spark.sql.expressions.Window
      .partitionBy("doc_id").orderBy(col("r").desc, col("w"))
    val out = rank.withColumn("pos", row_number().over(byDoc))
      .where(col("pos") <= topK)
      .select(col("doc_id"), col("pos").cast("long").as("pos"), col("w"),
        (col("r").cast("double") / 1000000.0).as("score"))
      .localCheckpoint()
    Seq(sym, deg, rank).foreach(IterUtils.unpersistCheckpoint)
    out
  }
}
