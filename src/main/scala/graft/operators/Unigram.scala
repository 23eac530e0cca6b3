package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Distributed unigram-LM tokenizer training + segmentation (Kudo 2018,
  * "Subword Regularization" — the SentencePiece unigram model, the other
  * staple tokenizer family next to [[Bpe]]), reduced to its deterministic
  * core: hard-EM (Viterbi E-step) over an integer-quantized model.
  *
  * DETERMINISM: every log-probability is quantized to integer
  * 1e-4-nat units (round(ln p * 10000) as a long) BEFORE the DP, so the
  * Viterbi recurrence is exact integer arithmetic — bit-identical across
  * engines, runs, and summation orders (the integer-quantized k-means
  * argument applied to a DP). Ties break toward the smallest split point
  * (= the longest final piece), a total order both engines reproduce.
  *
  * SCALE SHAPE: training never iterates over the CORPUS. One corpus pass
  * builds the distinct-(word, count) table — vocab-sized, orders of
  * magnitude smaller than 100 TB of text — and every EM round is one
  * distributed Viterbi pass over that table against a BROADCAST model
  * (vocab-sized by construction, the [[Bpe]] merge-table argument)
  * followed by a map-side-combined usage aggregation. Driver state is
  * one (piece, count) array per round — the bounded-model convention.
  * Segmentation broadcasts the final model and Viterbi-segments per word
  * inside mapPartitions with a capped per-partition word cache —
  * scan-speed, shuffle-free, exactly [[Bpe.segment]]'s API shape.
  */
object Unigram {

  /** One model row: `usage` is the E-step count that produced it (seed
    * frequency for round 0), `lnpQ` the quantized log-prob. */
  case class Piece(piece: String, usage: Long, lnpQ: Long)

  /** Quantization grid: lnpQ = round(ln(p) * Quant). */
  val Quant = 10000.0

  private val NegInf = Long.MinValue / 4

  /** Hard cap on [[segment]]'s per-partition word→pieces cache (the
    * [[Bpe]] Zipf argument: hot words land in a small distinct prefix;
    * past the cap, tail words segment directly). */
  private val SegmentCacheCap = 1 << 16

  /** Distinct (word, count) table — the vocab-sized training input. */
  private def words(docs: DataFrame, textCol: String): DataFrame = docs
    .select(explode(TextAnalysis.tokens(col(textCol))).as("word"))
    .where(length(col("word")) > 0)
    .groupBy("word").agg(count(lit(1)).as("cnt"))

  /** Integer-Viterbi segmentation of one word under quantized log-probs.
    * best(j) = max over i of best(i) + lnpQ(word[i..j)); i ascends and
    * only a STRICT improvement replaces, so ties keep the smallest i —
    * the longest final piece — a total, engine-portable order. Returns
    * null when the word cannot be covered by the model's pieces. */
  private[operators] def viterbi(w: String, lnpQ: collection.Map[String, Long],
      maxLen: Int): Array[String] = {
    val n = w.length
    if (n == 0) return Array.empty
    val best = Array.fill(n + 1)(NegInf); best(0) = 0L
    val back = Array.fill(n + 1)(-1)
    var j = 1
    while (j <= n) {
      var i = math.max(0, j - maxLen)
      while (i < j) {
        if (best(i) != NegInf) {
          lnpQ.get(w.substring(i, j)) match {
            case Some(s) =>
              val cand = best(i) + s
              if (cand > best(j)) { best(j) = cand; back(j) = i }
            case None => ()
          }
        }
        i += 1
      }
      j += 1
    }
    if (best(n) == NegInf) null
    else {
      val out = scala.collection.mutable.ArrayBuffer.empty[String]
      var p = n
      while (p > 0) { val i = back(p); out += w.substring(i, p); p = i }
      out.reverseIterator.toArray
    }
  }

  /** Seed candidate vocabulary: every substring of length 1..`maxPieceLen`
    * of every corpus word, counted with multiplicity weighted by word
    * frequency; pieces below `minCount` are cut EXCEPT single characters
    * (kept unconditionally so every word stays segmentable). Initial
    * probs are the normalized counts over the kept set, quantized.
    *
    * SCALE: the substring generation runs on the distinct-word table
    * (vocab-sized), not the corpus; the piece space is bounded by
    * charset^maxPieceLen. One corpus tokenize pass, one piece groupBy
    * with map-side combine, a single-row total broadcast back. */
  def seedPieces(docs: DataFrame, maxPieceLen: Int, minCount: Long,
      textCol: String = "text"): DataFrame = {
    val w = words(docs, textCol)
    val subs = w.select(col("cnt"), explode(flatten(
        transform(sequence(lit(1), least(length(col("word")), lit(maxPieceLen))),
          l => transform(sequence(lit(1), length(col("word")) - l + 1),
            s => col("word").substr(s, l))))).as("piece"))
    val kept = subs.groupBy("piece").agg(sum("cnt").as("cnt"))
      .where(col("cnt") >= minCount || length(col("piece")) === 1)
    kept.crossJoin(broadcast(kept.agg(sum("cnt").as("t")))) // single-row
      .select(col("piece"), col("cnt").as("usage"),
        round((log(col("cnt").cast("double")) - log(col("t").cast("double")))
          * Quant).cast("long").as("lnp_q"))
  }

  /** One hard-EM round: Viterbi-segment every distinct word under the
    * model (E-step), re-estimate piece probabilities from the usage
    * counts (M-step). Input `pieces` must have (piece, lnp_q) columns;
    * returns (piece, usage, p_new) for every piece the E-step used,
    * p_new = usage / total rounded to 4 dp. Words the model cannot cover
    * contribute nothing (cannot happen when the model kept all single
    * chars, as [[seedPieces]] and [[train]] both do).
    *
    * SCALE: the model is collected once (vocab-bounded, the Bpe merge
    * argument) and broadcast; the E-step is one mapPartitions pass over
    * the distinct-word table; usage partial-aggregates map-side. */
  def emRound(docs: DataFrame, pieces: DataFrame,
      textCol: String = "text"): DataFrame = {
    val spark = docs.sparkSession
    import spark.implicits._
    val model = pieces.select(col("piece"), col("lnp_q"))
      .as[(String, Long)].collect()
    val maxLen = if (model.isEmpty) 1 else model.iterator.map(_._1.length).max
    val bc = spark.sparkContext.broadcast(model.toMap)
    val usage = words(docs, textCol).as[(String, Long)]
      .mapPartitions { it =>
        val m = bc.value
        it.flatMap { case (w, c) =>
          val seg = viterbi(w, m, maxLen)
          if (seg == null) Iterator.empty
          else seg.iterator.map(p => (p, c))
        }
      }
      .toDF("piece", "cnt")
      .groupBy("piece").agg(sum("cnt").as("usage"))
    usage.crossJoin(broadcast(usage.agg(sum("usage").as("t")))) // single-row
      .select(col("piece"), col("usage"),
        round(col("usage") / col("t"), 4).as("p_new"))
  }

  /** Full trainer: seed, then `rounds` hard-EM rounds, pruning after
    * each to the `vocabSize` highest-usage pieces (usage desc, piece asc
    * — a total order, so the cut is reproducible) while keeping every
    * single-character piece unconditionally. Re-estimated probs are
    * Laplace-smoothed — lnpQ = round((ln(usage+1) − ln(total+V))·1e4) —
    * so a kept-but-unused single char retains a finite score. Returns
    * the final model sorted by piece.
    *
    * Driver state per round: one vocab-bounded (piece, usage) array —
    * the same contract as [[Bpe.train]]'s merge list and the k-means
    * centroid collect. The distinct-word table is materialized once
    * (localCheckpoint) and re-read by every round's broadcast-Viterbi
    * pass; no lineage accumulates across rounds. */
  def train(docs: DataFrame, vocabSize: Int, maxPieceLen: Int = 4,
      minCount: Long = 2L, rounds: Int = 2,
      textCol: String = "text"): Seq[Piece] = {
    val spark = docs.sparkSession
    import spark.implicits._
    val wtab = words(docs, textCol).as[(String, Long)].localCheckpoint()
    try {
      var model: Array[Piece] = seedPieces(docs, maxPieceLen, minCount, textCol)
        .as[(String, Long, Long)].collect()
        .map { case (p, u, q) => Piece(p, u, q) }
      var r = 0
      while (r < rounds) {
        val maxLen = model.iterator.map(_.piece.length).max
        val bc = spark.sparkContext.broadcast(
          model.iterator.map(p => (p.piece, p.lnpQ)).toMap)
        val usages = wtab.mapPartitions { it =>
            val m = bc.value
            it.flatMap { case (w, c) =>
              val seg = viterbi(w, m, maxLen)
              if (seg == null) Iterator.empty else seg.iterator.map(p => (p, c))
            }
          }
          .toDF("piece", "cnt").groupBy("piece").agg(sum("cnt").as("usage"))
          .as[(String, Long)].collect().toMap
        // prune: all single chars + the top multi-char pieces by usage
        val singles = model.filter(_.piece.length == 1)
          .map(p => p.copy(usage = usages.getOrElse(p.piece, 0L)))
        val multis = model.filter(p => p.piece.length > 1 &&
            usages.getOrElse(p.piece, 0L) > 0)
          .map(p => p.copy(usage = usages(p.piece)))
          .sortBy(p => (-p.usage, p.piece))
          .take(math.max(0, vocabSize - singles.length))
        val kept = singles ++ multis
        val total = kept.iterator.map(_.usage).sum.toDouble
        val v = kept.length.toDouble
        model = kept.map(p => p.copy(lnpQ =
          math.round((math.log(p.usage + 1.0) - math.log(total + v)) * Quant)))
        bc.destroy()
        r += 1
      }
      model.sortBy(_.piece).toSeq
    } finally IterUtils.unpersistCheckpoint(wtab)
  }

  /** Segments each document with a trained model — [[Bpe.segment]]'s API
    * shape: (idCol, subwords array), in document token order. A word the
    * model cannot cover (an unseen character) is emitted whole as a
    * single piece — lossless and deterministic, the by-word UNK rule.
    * The model is broadcast (vocab-bounded); the pass is shuffle-free
    * with a capped per-partition word cache. */
  def segment(docs: DataFrame, model: Seq[Piece], idCol: String = "doc_id",
      textCol: String = "text"): DataFrame = {
    val spark = docs.sparkSession
    import spark.implicits._
    val maxLen = if (model.isEmpty) 1 else model.iterator.map(_.piece.length).max
    val bc = spark.sparkContext.broadcast(
      model.iterator.map(p => (p.piece, p.lnpQ)).toMap)
    docs.select(col(idCol).cast("long"), col(textCol))
      .as[(Long, String)]
      .mapPartitions { it =>
        val m = bc.value
        val cache = scala.collection.mutable.HashMap.empty[String, Array[String]]
        def segWord(w: String): Array[String] = {
          val v = viterbi(w, m, maxLen)
          if (v == null) Array(w) else v
        }
        it.map { case (id, text) =>
          val toks = text.split(" ").filter(_.nonEmpty).flatMap { w =>
            cache.get(w) match {
              case Some(s) => s
              case None =>
                val s = segWord(w)
                if (cache.size < SegmentCacheCap) cache.update(w, s)
                s
            }
          }
          (id, toks)
        }
      }
      .toDF(idCol, "subwords")
  }
}
