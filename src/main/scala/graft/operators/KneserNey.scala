package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Interpolated Kneser-Ney bigram language model (Kneser & Ney 1995;
  * Chen & Goodman 1998 eq. 4.25) trained and evaluated entirely as
  * join-aggregate programs — the held-out-perplexity quality signal a
  * data pipeline wants from a model-free n-gram fit:
  *
  *   P(w|v) = max(c(vw) − D, 0)/c(v) + D·N1+(v·)/c(v) · N1+(·w)/B
  *
  * with discount D = 0.75, N1+(v·) the distinct continuations of v,
  * N1+(·w) the distinct histories of w, and B the bigram type count.
  * The continuation distribution is what distinguishes KN from plain
  * backoff: "Francisco" is frequent but only ever follows "San", so its
  * unigram continuation weight is tiny.
  *
  * Determinism: every model quantity is an exact integer count; each
  * scored bigram composes ONE fixed double chain from those integers,
  * and only the corpus-level mean of the logs is display-rounded.
  */
object KneserNey {

  /** Fit on `train`, score `test` (both (doc_id, text)); returns one row
    * (n_bigram_types, n_scored, n_skipped_oov, avg_log2p, perplexity).
    * Scored bigrams are those whose history v occurs in training AND
    * whose continuation w has at least one training history (P > 0 is
    * then guaranteed); the OOV remainder is counted, not imputed — an
    * eval-set contract, not a smoothing fudge.
    *
    * SCALE: model tables are token-type-sized aggregations with
    * map-side combine; scoring is two type-keyed joins onto the test
    * bigram relation (AQE broadcasts the model sides when they measure
    * small). The bigram type count B enters as a broadcast 1-row cross.
    * Nothing is collected to the driver. */
  def bigramScore(train: DataFrame, test: DataFrame,
      d: Double = 0.75): DataFrame = {
    def bigrams(df: DataFrame): DataFrame = df
      .select(split(col("text"), " ").as("t"))
      .select(explode(expr(
        "zip_with(slice(t, 1, size(t) - 1), slice(t, 2, size(t) - 1)," +
          " (a, b) -> struct(a AS v, b AS w))")).as("b"))
      .select(col("b.v").as("v"), col("b.w").as("w"))
    val tb = bigrams(train).localCheckpoint() // feeds all four model tables
    val cvw = tb.groupBy("v", "w").agg(count(lit(1)).as("cvw"))
      .localCheckpoint() // feeds counts + both continuation tables
    val cv = cvw.groupBy("v")
      .agg(sum("cvw").cast("long").as("cv"), count(lit(1)).as("n1fwd"))
    val n1back = cvw.groupBy("w").agg(count(lit(1)).as("n1back"))
    val btypes = cvw.agg(count(lit(1)).as("b_types"))
    val scored = bigrams(test)
      .join(cv, Seq("v"), "left")
      .join(n1back, Seq("w"), "left")
      .join(cvw, Seq("v", "w"), "left")
      .join(broadcast(btypes))
    val inVocab = col("cv").isNotNull && col("n1back").isNotNull
    val p = greatest(coalesce(col("cvw"), lit(0L)).cast("double") - lit(d),
        lit(0.0)) / col("cv").cast("double") +
      lit(d) * col("n1fwd").cast("double") / col("cv").cast("double") *
        (col("n1back").cast("double") / col("b_types").cast("double"))
    scored.agg(
      max(col("b_types")).cast("long").as("n_bigram_types"),
      sum(when(inVocab, 1L).otherwise(0L)).cast("long").as("n_scored"),
      sum(when(inVocab, 0L).otherwise(1L)).cast("long").as("n_skipped_oov"),
      (round(avg(when(inVocab, log2(p))) * 1000000.0) / 1000000.0)
        .as("avg_log2p"),
      (round(pow(lit(2.0), -avg(when(inVocab, log2(p)))) * 10000.0)
        / 10000.0).as("perplexity"))
  }
}
