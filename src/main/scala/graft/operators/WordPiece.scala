package graft.operators

import org.apache.spark.sql.{Column, DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** WordPiece tokenizer family (Schuster & Nakajima 2012, "Japanese and
  * Korean voice search"; the BERT tokenizer) — the third public subword
  * family next to BPE ([[Bpe]]) and unigram-LM ([[Unigram]]).
  *
  * Two halves, mirroring how the family is actually used:
  *
  *   - TRAINING picks merges by likelihood gain, not raw pair frequency:
  *     score(a,b) = count(ab) / (count(a)·count(b)) — the increase in a
  *     unigram LM's corpus likelihood from fusing the pair. [[scoreRound]]
  *     materializes one scoring round closed-form (every candidate pair
  *     with its counts and ln-score) so the selection rule itself is
  *     oracle-checkable; the ln-decomposition ln pc − ln ca − ln cb is
  *     monotone in the score and engine-portable under the 4 dp rounding
  *     convention (q110/q130).
  *
  *   - SEGMENTATION is greedy longest-match-first (MaxMatch) against a
  *     piece vocabulary, word-initial pieces plain and continuations
  *     `##`-prefixed, exactly BERT's `wordpiece_tokenizer` contract.
  *     [[segment]] runs it scan-speed: the vocab broadcasts as a hash set
  *     and each partition segments its docs with a capped word cache (the
  *     [[Bpe.segment]] shape) — no shuffle, no per-row UDF.
  *
  * SCALE SHAPE: like [[Bpe.train]]/[[Unigram]], nothing here iterates the
  * corpus. Scoring runs on the distinct-(word, count) table (vocab-sized
  * after one corpus pass); symbol/pair tables are alphabet- and
  * vocab-bounded; the segmentation vocab is count-thresholded and
  * explicitly bounded before it is collected for broadcast.
  */
object WordPiece {

  /** Distinct (word, cnt) table — one corpus pass, the only corpus-sized
    * shuffle in the module (map-side combined). */
  private def words(docs: DataFrame, textCol: String): DataFrame = docs
    .select(explode(TextAnalysis.tokens(col(textCol))).as("word"))
    .where(length(col("word")) > 0)
    .groupBy("word").agg(count(lit(1)).as("cnt"))

  /** Char-level WordPiece symbolization as a column: position 1 plain,
    * positions 2..n `##`-prefixed ("hello" → [h, ##e, ##l, ##l, ##o]). */
  private def symbolsCol: Column = expr(
    """transform(sequence(1, length(word)),
      |  i -> IF(i = 1, substring(word, 1, 1),
      |          concat('##', substring(word, i, 1))))""".stripMargin)

  /** One likelihood-scoring round over the char-level symbolization: every
    * adjacent symbol pair with its pair count, both symbol counts, and
    * score_ln = round(ln pc − ln ca − ln cb, 4); top `topN` by
    * (score_ln desc, lsym, rsym) — the pair WordPiece training would fuse
    * next is row 1. Counts are exact integers; the ln-decomposition is
    * composed identically in the DuckDB oracle so the rounded doubles
    * match bit-for-bit. */
  def scoreRound(docs: DataFrame, topN: Int = 20,
      textCol: String = "text"): DataFrame = {
    // both the symbol-count and pair-count branches read the word table;
    // checkpointing it (vocab-sized — one corpus pass) keeps the corpus
    // scan single even though Spark won't CSE across the two branches.
    // LIFETIME: the checkpoint blocks back the lazily-returned DataFrame,
    // so they cannot be unpersisted here; they are vocab-sized and are
    // released when the result DataFrame is GC'd (callers that loop
    // rounds and materialize each result — [[train]] — unpersist per
    // round instead)
    val w = words(docs, textCol).localCheckpoint()
    scorePairs(w.select(col("cnt"), symbolsCol.as("syms")))
      .orderBy(col("score_ln").desc, col("lsym"), col("rsym"))
      .limit(topN)
  }

  /** Every adjacent symbol pair of a (cnt, syms) table with its counts
    * and likelihood score — the shared scoring kernel of [[scoreRound]]
    * (round 1, presented) and [[train]] (every round's argmax).
    * Unordered and uncut; callers sort/limit. */
  private def scorePairs(syms: DataFrame): DataFrame = {
    // symbol occurrence counts (vocab-bounded: symbols are chars, then
    // fused pieces — never more rows than symbol positions in the vocab)
    val symCnt = syms
      .select(col("cnt"), explode(col("syms")).as("sym"))
      .groupBy("sym").agg(sum("cnt").as("c"))
    // adjacent-pair counts; slice+posexplode pairs sym[i] with sym[i+1]
    val pairCnt = syms
      .where(size(col("syms")) >= 2)
      .select(col("cnt"), col("syms"),
        posexplode(expr("slice(syms, 1, size(syms) - 1)")))
      .select(col("cnt"), col("col").as("lsym"),
        element_at(col("syms"), col("pos") + 2).as("rsym"))
      .groupBy("lsym", "rsym").agg(sum("cnt").as("pc"))
    pairCnt
      .join(broadcast(symCnt.withColumnRenamed("sym", "lsym")
        .withColumnRenamed("c", "lc")), Seq("lsym"))
      .join(broadcast(symCnt.withColumnRenamed("sym", "rsym")
        .withColumnRenamed("c", "rc")), Seq("rsym"))
      .select(col("lsym"), col("rsym"),
        col("pc").cast("long").as("pair_cnt"),
        col("lc").cast("long").as("left_cnt"),
        col("rc").cast("long").as("right_cnt"),
        round(log(col("pc")) - log(col("lc")) - log(col("rc")), 4)
          .as("score_ln"))
  }

  /** One learned WordPiece fusion: `round` is application order
    * (1-based), (lsym, rsym) the adjacent pair the likelihood argmax
    * chose, `piece` the fused symbol (lsym ++ rsym without its `##`). */
  case class WpMerge(round: Int, lsym: String, rsym: String, piece: String,
      pair_cnt: Long, score_ln: Double)

  private[operators] case class WpWordRow(syms: Array[String], cnt: Long)

  /** [[Bpe.mergeOnce]]'s left-to-right non-overlapping adjacent-pair scan
    * with WordPiece's fusion spelling: the fused symbol keeps lsym's
    * word-position form and drops rsym's continuation marker (a merged
    * symbol does NOT participate again within the same round). */
  private[graft] def fuseOnce(syms: Array[String], l: String, r: String,
      piece: String): Array[String] = {
    val out = new scala.collection.mutable.ArrayBuffer[String](syms.length)
    var i = 0
    while (i < syms.length) {
      if (i + 1 < syms.length && syms(i) == l && syms(i + 1) == r) {
        out += piece; i += 2
      } else { out += syms(i); i += 1 }
    }
    out.toArray
  }

  /** The ITERATIVE WordPiece trainer (the [[Bpe.train]] loop driven by
    * [[scoreRound]]'s likelihood rule): `rounds` times, score every
    * adjacent pair on the current symbolization, fuse the argmax —
    * (score_ln desc, lsym, rsym), the q155 total order — into a new
    * vocabulary piece, and rewrite the word table. Rounds with no
    * adjacent pair left stop early.
    *
    * SCALE SHAPE: identical to BPE training — the corpus is read ONCE
    * into the distinct-(word, cnt) table; every round runs on that
    * vocab-sized table (two map-side-combined aggregations, a 1-row
    * TakeOrdered argmax, a typed rewrite map), localCheckpoint'd per
    * round with the superseded round's blocks released eagerly. */
  def train(docs: DataFrame, rounds: Int,
      textCol: String = "text"): Seq[WpMerge] = {
    val spark = docs.sparkSession
    import spark.implicits._
    var cur: Dataset[WpWordRow] = words(docs, textCol)
      .select(symbolsCol.as("syms"), col("cnt"))
      .as[WpWordRow].localCheckpoint()
    val out = Seq.newBuilder[WpMerge]
    var r = 1
    var done = false
    while (r <= rounds && !done) {
      val best = scorePairs(cur.toDF())
        .orderBy(col("score_ln").desc, col("lsym"), col("rsym"))
        .limit(1).collect()
      if (best.isEmpty) done = true
      else {
        val b = best(0)
        val l = b.getAs[String]("lsym")
        val rs = b.getAs[String]("rsym")
        val piece = l + rs.stripPrefix("##")
        out += WpMerge(r, l, rs, piece, b.getAs[Long]("pair_cnt"),
          b.getAs[Double]("score_ln"))
        val next = cur.map(w => WpWordRow(fuseOnce(w.syms, l, rs, piece),
          w.cnt)).localCheckpoint()
        IterUtils.unpersistCheckpoint(cur)
        cur = next
        r += 1
      }
    }
    IterUtils.unpersistCheckpoint(cur)
    out.result()
  }

  /** Data-derived MaxMatch vocabulary in `##`-form: word-initial pieces
    * are prefixes (start = 1), continuations are interior substrings
    * `##`-prefixed, lengths 1..`maxPieceLen`, kept when their summed word
    * count ≥ `minCount` — single chars unconditionally (the
    * [[Unigram.seedPieces]] convention), which makes every corpus word
    * coverable: any continuation position contributes its own `##`-char.
    * Vocab-bounded by construction (substrings of count-thresholded
    * distinct words). */
  def greedyVocab(docs: DataFrame, maxPieceLen: Int = 4, minCount: Long = 5L,
      textCol: String = "text"): DataFrame = {
    val w = words(docs, textCol)
    w.select(col("cnt"), explode(expr(
        s"""flatten(transform(sequence(1, length(word)),
           |  s -> transform(sequence(1, least($maxPieceLen, length(word) - s + 1)),
           |    l -> IF(s = 1, substring(word, s, l),
           |            concat('##', substring(word, s, l))))))""".stripMargin))
        .as("piece"))
      .groupBy("piece").agg(sum("cnt").as("cnt"))
      .where(col("cnt") >= minCount ||
        length(regexp_replace(col("piece"), "^##", "")) === 1)
      .select("piece", "cnt")
  }

  /** Hard cap on [[segment]]'s per-partition word cache — see
    * [[Bpe]]'s SegmentCacheCap rationale (Zipfian hit mass; executor
    * memory must not scale with a partition's distinct-word count). */
  private val SegmentCacheCap = 1 << 16

  /** Greedy longest-match-first segmentation against a `##`-form vocab:
    * at each position take the longest piece (≤ `maxPieceLen`) present in
    * the vocab, continuations `##`-prefixed; a word with an uncoverable
    * position becomes one `[UNK]` (BERT's whole-word UNK rule). The vocab
    * broadcasts as a set; the pass is shuffle-free scan-speed. Output:
    * (idCol, piece_str, n_pieces) — pieces space-joined (pieces are
    * substrings of space-split words, so the join is lossless). */
  def segment(docs: DataFrame, vocab: Set[String], maxPieceLen: Int = 4,
      idCol: String = "doc_id", textCol: String = "text"): DataFrame = {
    val spark = docs.sparkSession
    import spark.implicits._
    val bc = spark.sparkContext.broadcast(vocab)
    docs.select(col(idCol).cast("long"), col(textCol))
      .as[(Long, String)]
      .mapPartitions { it =>
        val v = bc.value
        val cache = scala.collection.mutable.HashMap.empty[String, Array[String]]
        def segWord(word: String): Array[String] = {
          val out = scala.collection.mutable.ArrayBuffer.empty[String]
          var pos = 0
          while (pos < word.length) {
            var l = math.min(maxPieceLen, word.length - pos)
            var hit: String = null
            while (l >= 1 && hit == null) {
              val cand =
                if (pos == 0) word.substring(0, l)
                else "##" + word.substring(pos, pos + l)
              if (v.contains(cand)) hit = cand else l -= 1
            }
            if (hit == null) return Array("[UNK]")
            out += hit; pos += l
          }
          out.toArray
        }
        it.map { case (id, text) =>
          val pieces = text.split(" ").filter(_.nonEmpty).flatMap { w =>
            cache.getOrElse(w, {
              val p = segWord(w)
              if (cache.size < SegmentCacheCap) cache.update(w, p)
              p
            })
          }
          (id, pieces.mkString(" "), pieces.length.toLong)
        }
      }
      .toDF(idCol, "piece_str", "n_pieces")
  }

  /** [[greedyVocab]] collected for [[segment]] — the explicit
    * driver-residency seam: the vocab is count-thresholded and
    * vocab-bounded (model-sized, like [[Unigram.train]]'s piece table and
    * the q130 DSIR models), never corpus-sized. */
  def trainedVocab(docs: DataFrame, maxPieceLen: Int = 4, minCount: Long = 5L,
      textCol: String = "text"): Set[String] =
    greedyVocab(docs, maxPieceLen, minCount, textCol)
      .select("piece").collect().map(_.getString(0)).toSet
}
