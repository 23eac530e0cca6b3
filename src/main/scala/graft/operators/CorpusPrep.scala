package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** End-to-end training-corpus preparation: the composition a data-prep run
  * actually executes, as ONE operator so the whole chain is a single scan +
  * a single shuffle (ref: the reference's gated-pipeline shape,
  * src/cpc_etl/orchestrator.py:31-58, re-expressed for documents).
  *
  * Stage order is chosen for 100 TB:
  *   1. annotate — lang-id, token count, quality, normalization fingerprint
  *      as one codegen'd projection (per-row, shuffle-free, scan-speed);
  *   2. gate — language + quality filters BEFORE any shuffle, so rejected
  *      documents (typically the majority of a web crawl) never leave the
  *      scan stage and never hit the network;
  *   3. dedup — exact dedup on the whitespace/case-normalization
  *      fingerprint, keeping the lowest doc_id. `min_by` over a struct is
  *      partial-aggregable, so Spark map-side-combines per input partition
  *      and shuffles only one candidate row per (partition, fingerprint) —
  *      this is the operator's ONLY exchange.
  *
  * Quality is gated on the 1e-6-rounded score so the cut is reproducible
  * across engines (raw double formula drift at the threshold boundary
  * cannot flip membership).
  */
object CorpusPrep {

  def prepare(docs: DataFrame,
      langs: Seq[String] = Seq("en"),
      minQuality: Double = 0.3): DataFrame = {
    val annotated = docs.select(
      col("doc_id"),
      TextAnalysis.langId(col("text")).as("lang"),
      TextAnalysis.tokenCount(col("text")).as("n_tokens"),
      (round(TextAnalysis.qualityScore(col("text")) * 1000000.0) / 1000000.0)
        .as("quality"),
      TextAnalysis.fingerprint(col("text")).as("fp"))

    val gated = annotated
      .filter(col("lang").isin(langs.map(lit): _*) && col("quality") >= minQuality)

    gated.groupBy("fp")
      .agg(
        min_by(struct(col("doc_id"), col("lang"), col("n_tokens"), col("quality")),
          col("doc_id")).as("keep"),
        count(lit(1)).cast("long").as("n_copies"))
      .select(col("keep.doc_id").as("doc_id"), col("keep.lang").as("lang"),
        col("keep.n_tokens").as("n_tokens"), col("keep.quality").as("quality"),
        col("n_copies"))
  }
}
