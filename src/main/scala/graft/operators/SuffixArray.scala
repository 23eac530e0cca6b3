package graft.operators

import org.apache.spark.sql.{Column, DataFrame, Row}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{LongType, StructField, StructType}

/** Distributed truncated suffix array by prefix doubling (Manber &
  * Myers 1990), word-granular — the exact-substring index behind
  * "Deduplicating Training Data Makes Language Models Better" (Lee et
  * al. 2022, arXiv:2107.06499): after ⌈log₂ D⌉ rounds every corpus
  * position carries the dense rank of its depth-D word prefix, so
  * positions sharing a rank share an exact D-word window — duplicate
  * detection with NO hashing (collision-free, unlike MinHash/rolling
  * hashes) and NO D-word string materialization.
  *
  * Why prefix doubling at cluster scale: the naive alternative shuffles
  * every D-word window (D × corpus tokens of STRING payload, the q109
  * rolling-hash shape but exact) — this instead shuffles ⌈log₂ D⌉
  * rounds of fixed-width (rank, rank) LONG pairs, each round one
  * hash-join on (doc, off+k) plus one range-partitioned dense rank.
  * Rank width is independent of D: doubling the window depth adds ONE
  * round, not another corpus copy.
  *
  * The dense rank rides the [[DistributedRank]] two-phase discipline
  * (range partition + sort, bounded per-partition boundary collect,
  * broadcast offsets, map-side assignment) and — the round-17
  * composition contract — reads its partition index from the RDD's OWN
  * `mapPartitionsWithIndex` split, never `TaskContext.getPartitionId()`,
  * so results are invariant under downstream union/coalesce.
  *
  * Suffix semantics: suffixes are PER DOCUMENT (no cross-document
  * run-on, the corpus-concatenation separators of the paper made
  * implicit); a suffix shorter than the comparison horizon extends with
  * a sentinel that sorts before every real word, so equal ranks mean
  * "equal depth-D prefixes, including equal early termination".
  *
  * DEPTH COST MODEL (measured at sf1, DESIGN.md round 18): depth is
  * power-of-two by the doubling contract; Lee et al.'s ≥50-token
  * production setting maps to depth=64. Cost grows in ROUNDS =
  * log₂(depth), not in depth itself: shuffle volume 256→439 MB
  * (×1.71) and ~9-10 extra jobs per extra round from depth 8→64 on the
  * sf1 corpus, zero spill at every depth (rows never widen). Deeper
  * windows simultaneously shrink downstream duplicate-span mass, so
  * end-to-end [[exactSubstrDedup]] cost moves sub-linearly in rounds.
  */
object SuffixArray {

  /** (doc, off, word) token positions, 0-based offsets. The same
    * whitespace tokenization every oracle twin uses
    * (`string_split(text, ' ')`). */
  def tokens(docs: DataFrame, idCol: String = "doc_id",
      textCol: String = "text"): DataFrame =
    docs.select(col(idCol).cast("long").as("doc"),
        posexplode(split(col(textCol), " ")).as(Seq("off", "word")))
      .select(col("doc"), col("off").cast("long").as("off"), col("word"))

  /** Dense rank of the depth-`depth` word prefix of every suffix:
    * returns (doc, off, rank) where rank ∈ [1, #distinct prefixes] and
    * equal ranks ⟺ identical depth-bounded prefixes. Early-exits the
    * doubling once every rank is unique (the full suffix order is then
    * resolved — deeper rounds cannot split further). */
  def rankPrefixes(docs: DataFrame, idCol: String = "doc_id",
      textCol: String = "text", depth: Int = 8,
      partitions: Int = 0): DataFrame =
    rankPrefixesFromToks(
      tokens(docs, idCol, textCol).localCheckpoint(eager = false),
      depth, resolveParts(docs, partitions))

  private def resolveParts(docs: DataFrame, partitions: Int): Int =
    if (partitions > 0) partitions
    else docs.sparkSession.sessionState.conf.numShufflePartitions

  /** [[rankPrefixes]] over an ALREADY-CHECKPOINTED token table — the
    * seam that lets [[duplicateWindows]] / [[exactSubstrDedup]] reuse
    * ONE materialized (doc, off, word) relation for the doubling rounds,
    * the completeness filter, and the text-reconstruction join, instead
    * of re-running the corpus split+posexplode per consumer (the token
    * table was already held in checkpoint storage for the rounds, so
    * sharing it adds no storage — it only deletes whole corpus passes). */
  private[graft] def rankPrefixesFromToks(toks: DataFrame, depth: Int,
      nParts: Int): DataFrame = {
    require(depth >= 1 && (depth & (depth - 1)) == 0,
      s"depth=$depth must be a power of two (prefix doubling)")
    val spark = toks.sparkSession
    // the token count is a full scan, so it doubles as the checkpoint's
    // materializing action (callers pass a LAZY checkpoint)
    val nPos = toks.count()
    if (nPos == 0L) // empty corpus: the max(rank) early-exit probe has no row
      return toks.select(col("doc"), col("off"), lit(0L).as("rank")).limit(0)
    // round 0: rank = dense rank of the word itself. The vocabulary is
    // corpus-bounded but not driver-bounded: rank it distributed
    // (sortBy + zipWithIndex over DISTINCT words — one exchange of the
    // vocab, never of the corpus).
    val vocab = toks.select("word").distinct().rdd
      .map(_.getString(0)).sortBy(identity, ascending = true,
        numPartitions = nParts)
      .zipWithIndex().map { case (w, i) => Row(w, i + 1L) }
    val vocabDf = spark.createDataFrame(vocab, StructType(Seq(
      StructField("word", org.apache.spark.sql.types.StringType, false),
      StructField("r", LongType, false))))
    // lazy checkpoint: the allDistinct probe (a max agg, full scan)
    // doubles as the materializing action — one job, was two
    var ranked = toks.join(vocabDf, "word")
      .select(col("doc"), col("off"), col("r").as("rank"))
      .localCheckpoint(eager = false)
    var k = 1L
    // one probe on the word round; every later round gets its group
    // count for free from the dense-rank driver stitch — no extra action
    var distinct = allDistinct(ranked, nPos)
    while (k < depth && !distinct) {
      // pair each position's rank with the rank k positions ahead in the
      // SAME document; -1 = past the end, sorting before every real rank.
      // `df` needs NO checkpoint of its own: it is a pure map-side rank
      // assignment over the (r1, r2)-ranged relation that
      // denseRankPairsCounted already materialized in checkpoint storage,
      // so every downstream pass (the next round's range sampling +
      // shuffle, or the caller's joins) replays only that cheap map over
      // cached blocks — checkpointing it again cost one extra job per
      // round and doubled the stored bytes.
      val (df, groups) =
        denseRankPairsCounted(shiftRanks(ranked, k.toInt, nParts), nParts)
      ranked = df
      distinct = groups == nPos
      k *= 2
    }
    ranked
  }

  /** (doc, off, r1, r2) where r2 is the rank at (doc, off + k), or -1
    * past the document end — WITHOUT the self-join the textbook round
    * would run (whose both sides shuffle the whole position table).
    * Offsets are DENSE per document, so the row k positions ahead in
    * global (doc, off) order carries offset off+k whenever it shares
    * the doc: one range exchange, a bounded boundary collect (first k
    * rows per partition, ≤ partitions × depth/2 rows on the driver),
    * and a map-side slide — the [[SortedNeighborhood]] continuation
    * pattern, partition index taken from the RDD's own split (the
    * round-17 composition contract). Cuts each doubling round from
    * three corpus exchanges to two. */
  private[graft] def shiftRanks(ranked: DataFrame, k: Int,
      nParts: Int): DataFrame = {
    val spark = ranked.sparkSession
    // lazy checkpoint: the heads collect below reads every partition
    // (block-store caching materializes whole partitions even under a
    // take), so it doubles as the materializing action; the slide pass
    // then reads the same frozen blocks — head pass + slide still see
    // identical ranges, one job cheaper
    val ranged = ranked.repartitionByRange(nParts, col("doc"), col("off"))
      .sortWithinPartitions(col("doc"), col("off"))
      .localCheckpoint(eager = false)
    val cols = ranged.columns
    val (iDoc, iOff, iRank) =
      (cols.indexOf("doc"), cols.indexOf("off"), cols.indexOf("rank"))
    val heads: Map[Int, Array[(Long, Long)]] = ranged.rdd
      .mapPartitionsWithIndex { (pid, it) =>
        val h = it.take(k).map(r => (r.getLong(iDoc), r.getLong(iRank))).toArray
        if (h.isEmpty) Iterator.empty else Iterator((pid, h))
      }.collect().toMap
    val maxPid = ranged.rdd.getNumPartitions
    val bc = spark.sparkContext.broadcast(heads)
    val outSchema = StructType(Seq(
      StructField("doc", LongType, nullable = false),
      StructField("off", LongType, nullable = false),
      StructField("r1", LongType, nullable = false),
      StructField("r2", LongType, nullable = false)))
    val kk = k
    val out = ranged.rdd.mapPartitionsWithIndex { (pid, it) =>
      // first kk rows of the FOLLOWING partitions, in order — never more
      // than kk are consumed (short partitions walk further forward)
      val continuation = ((pid + 1) until maxPid).iterator
        .flatMap(p => bc.value.getOrElse(p, Array.empty[(Long, Long)]).iterator)
        .take(kk)
      // local rows emit; continuation rows only ever serve as lookahead
      val tagged = it.map(r =>
        (r.getLong(iDoc), r.getLong(iOff), r.getLong(iRank), true)) ++
        continuation.map(t => (t._1, 0L, t._2, false))
      val buf = scala.collection.mutable.Queue.empty[(Long, Long, Long, Boolean)]
      new Iterator[Row] {
        private var pending: Row = null
        private def advance(): Unit = {
          while (pending == null && (tagged.hasNext || buf.exists(_._4))) {
            while (tagged.hasNext && buf.size < kk + 1) buf.enqueue(tagged.next())
            if (buf.nonEmpty && (buf.size == kk + 1 || !tagged.hasNext)) {
              val (doc, off, r1, isLocal) = buf.dequeue()
              if (isLocal) {
                // dense offsets: the row kk ahead is (doc, off+kk) iff it
                // exists and shares the doc — rows between are same-doc
                val r2 = if (buf.size >= kk && buf(kk - 1)._1 == doc)
                  buf(kk - 1)._3 else -1L
                pending = Row(doc, off, r1, r2)
              }
            }
          }
        }
        def hasNext: Boolean = { advance(); pending != null }
        def next(): Row = { advance(); val r = pending; pending = null; r }
      }
    }
    spark.createDataFrame(out, outSchema)
  }

  private def allDistinct(ranked: DataFrame, nPos: Long): Boolean =
    ranked.agg(max("rank")).head.getLong(0) == nPos

  /** Distributed dense rank over the total order (r1, r2): range
    * partition + in-partition sort, ONE bounded collect of per-partition
    * (first key, last key, group count), a driver stitch for runs that
    * span partition boundaries, and a map-side assignment pass keyed by
    * the RDD's own split index. Input: (doc, off, r1, r2); output:
    * (doc, off, rank). */
  private[graft] def denseRankPairs(df: DataFrame, nParts: Int): DataFrame =
    denseRankPairsCounted(df, nParts)._1

  /** [[denseRankPairs]] plus the TOTAL group count the driver stitch
    * derives anyway — the early-exit signal (all ranks distinct) with
    * zero additional jobs. */
  private[graft] def denseRankPairsCounted(df: DataFrame,
      nParts: Int): (DataFrame, Long) = {
    val spark = df.sparkSession
    // lazy checkpoint, materialized by the stats pass (a full scan of
    // every partition) — both passes still see identical sampled ranges
    // from the frozen blocks, one job cheaper
    val ranged = df.repartitionByRange(nParts, col("r1"), col("r2"))
      .sortWithinPartitions(col("r1"), col("r2"))
      .localCheckpoint(eager = false)
    val cols = ranged.columns
    val (iDoc, iOff, iR1, iR2) = (cols.indexOf("doc"), cols.indexOf("off"),
      cols.indexOf("r1"), cols.indexOf("r2"))
    // pass 1: bounded — one (first, last, #groups) triple per partition
    val stats = ranged.rdd.mapPartitionsWithIndex { (pid, it) =>
      var first: (Long, Long) = null
      var last: (Long, Long) = null
      var groups = 0L
      it.foreach { r =>
        val key = (r.getLong(iR1), r.getLong(iR2))
        if (first == null) first = key
        if (key != last) groups += 1
        last = key
      }
      if (first == null) Iterator.empty
      else Iterator((pid, first, last, groups))
    }.collect().sortBy(_._1)
    // driver stitch: a group spanning a partition boundary is counted in
    // both — the later partition's base drops by one so its first local
    // group resolves to the SAME global rank
    var cum = 0L
    var prevLast: (Long, Long) = null
    val bases = scala.collection.mutable.Map.empty[Int, Long]
    stats.foreach { case (pid, first, last, groups) =>
      val continues = first == prevLast
      bases(pid) = if (continues) cum - 1 else cum
      cum += groups - (if (continues) 1 else 0)
      prevLast = last
    }
    val bc = spark.sparkContext.broadcast(bases.toMap)
    val outSchema = StructType(Seq(
      StructField("doc", LongType, nullable = false),
      StructField("off", LongType, nullable = false),
      StructField("rank", LongType, nullable = false)))
    // pass 2: the split index the RDD's own compute receives — invariant
    // under downstream union/coalesce (the q472 lesson)
    val out = ranged.rdd.mapPartitionsWithIndex { (pid, it) =>
      val base = bc.value.getOrElse(pid, 0L)
      var local = 0L
      var last: (Long, Long) = null
      it.map { r =>
        val key = (r.getLong(iR1), r.getLong(iR2))
        if (key != last) local += 1
        last = key
        Row(r.getLong(iDoc), r.getLong(iOff), base + local)
      }
    }
    (spark.createDataFrame(out, outSchema), cum)
  }

  /** Every exact duplicated `depth`-word window in the corpus:
    * (gram, cnt) for rank groups of complete windows with cnt ≥ 2. The
    * gram TEXT is reconstructed only for each group's representative
    * (min (doc, off)) — a result-sized join back to the token table,
    * never a corpus-wide string materialization. */
  def duplicateWindows(docs: DataFrame, depth: Int = 8,
      idCol: String = "doc_id", textCol: String = "text",
      partitions: Int = 0): DataFrame = {
    val toks = tokens(docs, idCol, textCol).localCheckpoint(eager = false)
    val ranks = rankPrefixesFromToks(toks, depth,
      resolveParts(docs, partitions))
    val lens = toks.groupBy("doc").agg(count(lit(1)).as("len"))
    val complete = ranks.join(lens, "doc")
      .where(col("off") + depth <= col("len"))
    val groups = complete.groupBy("rank")
      .agg(count(lit(1)).as("cnt"),
        min(struct(col("doc"), col("off"))).as("rep"))
      .where(col("cnt") >= 2)
      .select(col("rank"), col("cnt"),
        col("rep.doc").as("doc"), col("rep.off").as("off"))
    // fresh aliases: toks' attributes also live inside groups' lineage
    // (through lens), so an unaliased self-join would be ambiguous
    val tok2 = toks.select(col("doc").as("t_doc"),
      col("off").as("t_off"), col("word"))
    groups.join(tok2,
        col("t_doc") === col("doc") &&
          col("t_off") >= col("off") &&
          col("t_off") < col("off") + depth)
      .groupBy(col("rank"), col("cnt"))
      .agg(array_join(transform(array_sort(
        collect_list(struct(col("t_off").as("o"), col("word").as("w")))),
        e => e("w")), " ").as("gram"))
      .select(col("gram"), col("cnt"))
  }

  /** ExactSubstr deduplication (Lee et al. 2022 §4.1) on the suffix-
    * array index: every occurrence but the FIRST (smallest (doc, off))
    * of any exact `depth`-word window duplicated anywhere in the corpus
    * is excised, overlapping cuts merged per document — identical
    * output, by construction, to the rolling-hash
    * [[TrainingPrep.removeDuplicateSpans]] recipe at the same window
    * (equal ranks ⟺ equal windows, no hash in the loop), but the
    * candidate discovery shuffles fixed-width rank pairs instead of a
    * corpus of window strings. Returns (doc_id, clean_text, removed)
    * for every document. */
  def exactSubstrDedup(docs: DataFrame, depth: Int = 8,
      idCol: String = "doc_id", textCol: String = "text",
      partitions: Int = 0): DataFrame = {
    val toks = tokens(docs, idCol, textCol).localCheckpoint(eager = false)
    val ranks = rankPrefixesFromToks(toks, depth,
      resolveParts(docs, partitions))
    val lens = toks.groupBy("doc").agg(count(lit(1)).as("len"))
    val complete = ranks.join(lens, "doc")
      .where(col("off") + depth <= col("len"))
    val dups = complete.groupBy("rank")
      .agg(count(lit(1)).as("cnt"),
        min(struct(col("doc"), col("off"))).as("keep"))
      .where(col("cnt") >= 2)
    val spans = complete.join(dups, "rank")
      .where(!(col("doc") === col("keep.doc") &&
        col("off") === col("keep.off")))
      .select(col("doc").as("doc_id"), col("off").cast("int").as("s"),
        (col("off") + depth - 1).cast("int").as("e"))
    val base = docs.select(col(idCol).as("doc_id"),
      TextAnalysis.tokens(col(textCol)).as("w"))
    TrainingPrep.exciseSpans(base, spans)
  }
}
