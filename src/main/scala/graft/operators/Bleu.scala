package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** BLEU-2 (Papineni et al. 2002) between document PAIRS — the
  * order-sensitive overlap score that near-dup mining wants AFTER a
  * set-similarity candidate pass: Jaccard says "same vocabulary", BLEU
  * says "same sequences". Modified (clipped) n-gram precision for n=1,2
  * with the brevity penalty, candidate = id_b scored against reference
  * = id_a.
  *
  * Determinism: clipped counts are exact integer sums; each output is
  * one fixed double chain (ratio, exp, sqrt) display-rounded 1e-6.
  */
object Bleu {

  /** Score each (id_a, id_b) pair: p1/p2 clipped precisions, brevity
    * penalty, and bleu2 = bp·√(p1·p2).
    *
    * SCALE: gram-count tables are (doc, gram)-keyed aggregations; each
    * clip is a pair×gram join keyed on the SHARED gram — work
    * proportional to the pairs' overlapping grams, never corpus². The
    * token-count sidecar joins are doc-keyed. No driver state. */
  def bleu2Pairs(docs: DataFrame, pairs: DataFrame): DataFrame = {
    val toks = docs.select(col("doc_id"), split(col("text"), " ").as("t"))
      .localCheckpoint() // feeds four gram/count tables
    val uni = toks.select(col("doc_id"), explode(col("t")).as("g"))
      .groupBy("doc_id", "g").agg(count(lit(1)).as("c"))
    val bi = toks.select(col("doc_id"), explode(expr(
      "zip_with(slice(t, 1, size(t) - 1), slice(t, 2, size(t) - 1)," +
        " (a, b) -> concat(a, ' ', b))")).as("g"))
      .groupBy("doc_id", "g").agg(count(lit(1)).as("c"))
    val lens = toks.select(col("doc_id"),
      size(col("t")).cast("long").as("tot1"),
      greatest(size(col("t")) - 1, lit(0)).cast("long").as("tot2"))
    def clips(grams: DataFrame, name: String): DataFrame = pairs
      .join(grams.select(col("doc_id").as("id_b"), col("g"),
        col("c").as("cc")), Seq("id_b"))
      .join(grams.select(col("doc_id").as("id_a"), col("g"),
        col("c").as("rc")), Seq("id_a", "g"))
      .groupBy("id_a", "id_b")
      .agg(sum(least(col("cc"), col("rc"))).cast("long").as(name))
    val withLens = pairs.select(col("id_a"), col("id_b"))
      .join(lens.select(col("doc_id").as("id_b"),
        col("tot1").as("c_tot1"), col("tot2").as("c_tot2")), Seq("id_b"))
      .join(lens.select(col("doc_id").as("id_a"),
        col("tot1").as("r_tot1")), Seq("id_a"))
      .join(clips(uni, "clip1"), Seq("id_a", "id_b"), "left")
      .join(clips(bi, "clip2"), Seq("id_a", "id_b"), "left")
    val p1 = coalesce(col("clip1"), lit(0L)).cast("double") /
      col("c_tot1").cast("double")
    val p2 = when(col("c_tot2") > 0,
      coalesce(col("clip2"), lit(0L)).cast("double") /
        col("c_tot2").cast("double")).otherwise(lit(0.0))
    val bp = least(lit(1.0), exp(lit(1.0) -
      col("r_tot1").cast("double") / col("c_tot1").cast("double")))
    withLens.select(col("id_a"), col("id_b"),
      (round(p1 * 1000000.0) / 1000000.0).as("p1"),
      (round(p2 * 1000000.0) / 1000000.0).as("p2"),
      (round(bp * 1000000.0) / 1000000.0).as("bp"),
      (round(bp * sqrt(p1 * p2) * 1000000.0) / 1000000.0).as("bleu2"))
  }
}
