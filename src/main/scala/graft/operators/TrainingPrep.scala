package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Sequence assembly + benchmark-hygiene operators for LLM training-data
  * pipelines: packing documents into fixed token-budget training
  * sequences, overlapping context-window chunking, and n-gram
  * decontamination against an evaluation set.
  */
object TrainingPrep {

  /** Sequence packing: lay documents end-to-end into a token stream cut
    * every `budgetTokens`, reporting each doc's (sequence, offset) start
    * position. Packing is per-SHARD (shard = doc_id mod `shards`), each
    * shard's stream ordered by doc_id.
    *
    * SCALE: a single corpus-wide running sum would be a one-partition
    * window sort — the textbook anti-scale shape. Real pipelines pack per
    * output shard, which is what this does: `shards` independent windows,
    * each hash-partition-sized, embarrassingly parallel. One exchange on
    * shard, nothing else. The default (`shards <= 0`) sizes the shard
    * count to the cluster automatically (defaultParallelism), so the
    * windows keep every core busy at any deployment size; pass an
    * explicit count when the shard layout itself is the output contract
    * (training shard files, a cross-engine oracle, ...). */
  def pack(docs: DataFrame, budgetTokens: Int, shards: Int = 0,
      idCol: String = "doc_id", textCol: String = "text"): DataFrame = {
    val nShards =
      if (shards > 0) shards
      else docs.sparkSession.sparkContext.defaultParallelism
    val w = Window.partitionBy("shard").orderBy(idCol)
    docs.select(col(idCol), pmod(col(idCol), lit(nShards.toLong)).as("shard"),
        size(split(col(textCol), " ")).cast("long").as("n_tokens"))
      .withColumn("start_tok", sum(col("n_tokens")).over(w) - col("n_tokens"))
      .select(col(idCol), col("shard"), col("n_tokens"),
        floor(col("start_tok") / lit(budgetTokens)).as("pack_seq"),
        (col("start_tok") % budgetTokens).as("bin_offset"))
  }

  /** Overlapping context-window chunking: one output row per (doc, start)
    * with `chunkSize` whitespace tokens beginning every `stride` tokens
    * (the tail chunk may be shorter). Pure per-row generate — shuffle-free,
    * scan-speed, stays in whole-stage codegen. */
  def chunk(docs: DataFrame, chunkSize: Int, stride: Int,
      idCol: String = "doc_id", textCol: String = "text"): DataFrame =
    docs.select(col(idCol), split(col(textCol), " ").as("w"))
      .select(col(idCol), col("w"),
        explode(sequence(lit(0), size(col("w")) - 1, lit(stride))).as("start"))
      .select(col(idCol), col("start").cast("long").as("start"),
        array_join(slice(col("w"), col("start") + 1, lit(chunkSize)), " ").as("chunk"))

  /** Content-defined chunking (CDC — the Rabin/LBFS boundary idea at
    * word granularity): a chunk ends after every word whose portable
    * 60-bit md5 hash is ≡ 0 (mod `divisor`), so chunk boundaries are a
    * pure function of LOCAL content. That is the property fixed-window
    * chunking ([[chunk]]) lacks: inserting one word early in a document
    * shifts EVERY fixed window after it, but shifts only the single CDC
    * chunk containing the edit — all later boundaries re-align, which
    * is what makes chunk-level dedup robust to prepended headers and
    * small edits. Expected chunk length = `divisor` words. Returns
    * (doc_id, chunk_idx, n_words, chunk_hash) with chunk_hash the md5
    * of the chunk text (the cross-doc dedup key).
    *
    * SCALE: one generate (posexplode) + ONE window partitioned by
    * doc_id (per-document, never global — documents are bounded) + one
    * (doc, chunk) aggregation with map-side combine. Scan-shaped. */
  def cdcChunks(docs: DataFrame, divisor: Int = 8, idCol: String = "doc_id",
      textCol: String = "text"): DataFrame = {
    require(divisor >= 2, s"cdc divisor=$divisor")
    val toks = docs.select(col(idCol).as("did"),
      posexplode(split(col(textCol), " ")).as(Seq("pos", "w")))
    val bd = toks.withColumn("bd",
      when(pmod(graft.expressions.PortableHash.md5Hash60(col("w")),
        lit(divisor.toLong)) === 0L, 1L).otherwise(0L))
    // exclusive prefix count of boundary words = this word's chunk index
    val wIdx = Window.partitionBy("did").orderBy("pos")
      .rowsBetween(Window.unboundedPreceding, -1)
    bd.withColumn("chunk_idx", coalesce(sum(col("bd")).over(wIdx), lit(0L)))
      .groupBy(col("did").as("doc_id"), col("chunk_idx"))
      .agg(count(lit(1)).cast("long").as("n_words"),
        md5(expr("array_join(transform(sort_array(" +
          "collect_list(struct(pos, w))), s -> s.w), ' ')")).as("chunk_hash"))
  }

  /** Cross-document chunk-level dedup savings over [[cdcChunks]]: how
    * much of the corpus (in words) is redundant at CDC-chunk
    * granularity — the storage-dedup view of duplication, the
    * complement of the document-level (q20/q22) and span-level (q109)
    * reports. One summary row: total/unique chunk and word counts plus
    * the savings ratio 1 − unique/total. */
  def cdcDedupSavings(docs: DataFrame, divisor: Int = 8,
      idCol: String = "doc_id", textCol: String = "text"): DataFrame = {
    val g = cdcChunks(docs, divisor, idCol, textCol)
      .groupBy("chunk_hash")
      .agg(count(lit(1)).as("inst"), max(col("n_words")).as("nw"))
    g.agg(sum(col("inst")).cast("long").as("n_chunks"),
        count(lit(1)).cast("long").as("n_unique_chunks"),
        sum(col("inst") * col("nw")).cast("long").as("total_words"),
        sum(col("nw")).cast("long").as("unique_words"))
      .select(col("n_chunks"), col("n_unique_chunks"), col("total_words"),
        col("unique_words"),
        (round((lit(1.0) - col("unique_words").cast("double")
          / col("total_words").cast("double")) * 1000000.0) / 1000000.0)
          .as("savings_ratio"))
  }

  /** Boilerplate segment removal (CCNet/RefinedWeb-style line dedup,
    * adapted to unpunctuated corpora): split each document into
    * non-overlapping `segTokens`-token segments, drop segments whose
    * normalization fingerprint appears in more than `maxDocs` distinct
    * documents (headers, footers, injected templates), and rebuild the
    * document from the surviving segments in order. Documents whose
    * segments are ALL boilerplate disappear.
    *
    * SCALE: segment explode is a per-row generate; the document-frequency
    * aggregation shuffles only (md5 key, partial count) rows; the gate is
    * a LEFT ANTI join against the HOT fingerprints (segments in more than
    * `maxDocs` distinct docs). The hot set is NOT broadcast by default:
    * its true bound is distinct-segments/(maxDocs+1), and a template-heavy
    * crawl with a small `maxDocs` can push that to hundreds of millions of
    * fingerprints — an unconditional broadcast hint would bypass the
    * planner's size checks and OOM the driver. The default shuffle
    * anti-join costs one extra linear exchange on `fp` (the corpus side
    * already shuffles for the per-doc rebuild), and AQE still converts it
    * to a broadcast at runtime whenever the built hot set measures small —
    * "broadcast when small, shuffle otherwise" without trusting an
    * a-priori claim. `broadcastHotSet = true` is the explicit opt-in for
    * callers that KNOW their df cutoff keeps the set driver-sized. The one
    * corpus-sized shuffle left is the per-doc rebuild — which is the
    * output itself. */
  def removeBoilerplate(docs: DataFrame, segTokens: Int, maxDocs: Int,
      idCol: String = "doc_id", textCol: String = "text",
      broadcastHotSet: Boolean = false): DataFrame = {
    val segs = chunk(docs, segTokens, segTokens, idCol, textCol)
      .withColumn("fp", TextAnalysis.fingerprint(col("chunk")))
    val hot = segs.groupBy("fp")
      .agg(countDistinct(col(idCol)).as("seg_df"))
      .where(col("seg_df") > maxDocs)
    val gated = segs.join(if (broadcastHotSet) broadcast(hot) else hot,
      Seq("fp"), "left_anti")
    gated
      .groupBy(idCol)
      .agg(array_join(
        transform(sort_array(collect_list(struct(col("start"), col("chunk")))),
          s => s.getField("chunk")), " ").as("clean_text"))
  }

  /** Deterministic stratified sampling — the training-MIX knob: each
    * stratum (language, domain, source) keeps a different percentage of
    * its documents, so corpus composition can be reweighted without a
    * shuffle. Membership is a pure function of (salt, id) via the
    * engine-portable 60-bit md5 hash: reproducible across engines, runs
    * and cluster layouts, and different salts give independent samples
    * (cf. the unstratified q66). Strata absent from `ratesPct` are
    * dropped (rate 0). Per-row predicate — scan-speed, shuffle-free. */
  def stratifiedSample(df: DataFrame, ratesPct: Map[String, Int], salt: String,
      stratumCol: String = "stratum", idCol: String = "doc_id"): DataFrame = {
    val rate = ratesPct.toSeq.sortBy(_._1).foldLeft(lit(0)) {
      case (acc, (k, v)) => when(col(stratumCol) === k, lit(v)).otherwise(acc)
    }
    df.where(pmod(graft.expressions.PortableHash.md5Hash60(
      concat(lit(salt + ":"), col(idCol))), lit(100L)) < rate)
  }

  /** Benchmark decontamination: ids of corpus documents sharing at least
    * one word n-gram shingle with any document of an evaluation/benchmark
    * set — those documents leak test data into training and must be
    * dropped.
    *
    * SCALE: benchmark sets are tiny next to a training corpus, so the
    * benchmark's distinct hashed shingles are BROADCAST and the corpus
    * side is a map-side semi-join probe at scan speed — no corpus
    * shuffle at all. Shingles are compared as 64-bit hashes (injective in
    * practice, same argument as [[Dedup]]). */
  def contaminatedIds(docs: DataFrame, benchmark: DataFrame, n: Int = 3,
      idCol: String = "doc_id", textCol: String = "text"): DataFrame = {
    def hashes(df: DataFrame) = df.select(col(idCol).cast("long").as("did"),
      explode(graft.expressions.ShingleHashes.shingle_hashes(col(textCol), n)).as("sh"))
    val benchShingles = broadcast(hashes(benchmark).select("sh").distinct())
    hashes(docs).join(benchShingles, Seq("sh"), "left_semi")
      .select(col("did").as(idCol)).distinct()
  }

  /** Top-`k` most characteristic terms per document by tf-idf, with a
    * RATIONAL idf: score = tf * (N+1)/(df+1). The textbook ln() is
    * deliberately absent — measured on this corpus's df range, JVM
    * Math.log and DuckDB/libm ln disagree in the last bit on ~0.1% of
    * inputs, enough to flip a rank at a near-tie and break cross-engine
    * reproducibility. Add/multiply/divide and casts of exact integers are
    * correctly rounded under IEEE-754 in every engine, so the rational score is
    * bit-identical everywhere and the (score desc, term asc) ranking is
    * total and portable.
    *
    * SCALE: token explode is a per-row generate; tf and df are each one
    * scan-speed tokenize pass whose shuffle partial-aggregates map-side
    * (two passes by design — see the inline note on why sharing one
    * exchange or folding df into a window loses at scale); N joins in as
    * a broadcast single-row aggregate; the final per-doc top-k is a rank
    * window on the doc key, and Spark's WindowGroupLimit pre-prunes each
    * partition to k rows before the shuffle. Vocabulary (df) joins by
    * term — AQE broadcasts it when the measured vocabulary is small,
    * shuffles otherwise; no a-priori hint. */
  def tfIdfTopTerms(docs: DataFrame, k: Int,
      idCol: String = "doc_id", textCol: String = "text"): DataFrame = {
    val tok = docs
      .select(col(idCol), explode(split(col(textCol), " ")).as("term"))
      .where(col("term") =!= "")
    val tf = tok.groupBy(col(idCol), col("term"))
      .agg(count(lit(1)).as("tf"))
    // The df branch re-tokenizes the corpus (the optimizer prunes tf's
    // count into a bare distinct here, so the two subtrees are not
    // canonically equal and AQE cannot reuse the (doc,term) exchange).
    // That second scan is deliberate — each alternative is worse at
    // scale: a shared raw-token exchange shuffles unaggregated rows and
    // loses both branches' map-side combine (the q23/MinHash lesson); a
    // `count over (partition by term)` window folds df into one pass but
    // puts every occurrence of a stopword-grade hot term on a single
    // task; caching tf materializes corpus-scale state. Two scan-speed
    // passes whose shuffles both partial-aggregate is the cheapest
    // network shape.
    val df_ = tf.groupBy("term").agg(count(lit(1)).as("df"))
    val n = broadcast(docs.select(countDistinct(col(idCol)).as("n_docs")))
    val scored = tf.join(df_, "term").crossJoin(n)
      .withColumn("score", col("tf").cast("double") *
        ((col("n_docs") + 1).cast("double") / (col("df") + 1).cast("double")))
    val w = Window.partitionBy(idCol).orderBy(col("score").desc, col("term"))
    scored.withColumn("rank", row_number().over(w))
      .where(col("rank") <= k)
      .select(col(idCol), col("rank").cast("long").as("rank"), col("term"),
        (round(col("score") * 1000000.0) / 1000000.0).as("score"))
  }

  /** Deterministic training-shard assignment: every document gets a
    * (shard, pos) slot — shard by portable hash, position by hash order
    * within the shard — so the exported corpus is globally shuffled
    * (random-looking order, reproducible across runs and engines) without
    * ever materializing a global sort.
    *
    * SCALE: the one anti-pattern this replaces is ORDER BY random() over
    * the whole corpus — a corpus-wide range sort whose boundary sampling
    * re-executes the input. Here each shard's row_number window is an
    * independent hash-partition-sized sort running in parallel; one
    * exchange on shard, nothing global. Shards are balanced by
    * construction (uniform hash). */
  def shardExport(docs: DataFrame, nShards: Int, salt: String,
      idCol: String = "doc_id"): DataFrame = {
    val key = graft.expressions.PortableHash.md5Hash60(
      concat(lit(salt + ":"), col(idCol)))
    val w = Window.partitionBy("shard").orderBy(col("shuffle_key"), col(idCol))
    docs.select(col(idCol), key.as("shuffle_key"),
        pmod(key, lit(nShards.toLong)).as("shard"))
      .withColumn("pos", row_number().over(w).cast("long"))
      .drop("shuffle_key")
  }

  /** Writes the corpus as gzip JSONL shards — the standard LLM
    * training-data delivery format (one JSON object per line, one
    * directory per shard, reproducible membership and order). Composes
    * [[shardExport]]'s deterministic (shard, pos) slotting: shard = a
    * salted portable hash of the id (so membership is stable across runs
    * and engines), file order = the within-shard shuffle order.
    *
    * SCALE: the id-keyed join attaches slots, then ONE shard-keyed
    * exchange lays rows out and `sortWithinPartitions(pos)` orders each
    * shard's file — no global sort anywhere (shards sharing a task still
    * write their own directories in pos order). Gzip JSONL trades CPU for
    * the wire/disk format every downstream trainer ingests. Returns the
    * written row count (from a read-back of what landed). */
  def exportJsonlShards(docs: DataFrame, path: String, nShards: Int,
      salt: String, idCol: String = "doc_id"): Long = {
    val slots = shardExport(docs, nShards, salt, idCol)
    // sort key leads with the partition column: the dynamic-partition
    // writer requires its input ordered by partition expressions and
    // would otherwise insert its own shard-only re-sort, destroying pos
    // order inside each file
    val out = docs.join(slots, Seq(idCol))
      .repartition(nShards, col("shard"))
      .sortWithinPartitions(col("shard"), col("pos"))
    out.write.mode("overwrite")
      .partitionBy("shard")
      .option("compression", "gzip")
      .json(path)
    // read-back verification counts what actually LANDED (not what the
    // plan said it would write) — but with the writer's own schema made
    // explicit, so the count is ONE pass over the gzip export instead of
    // two (schema inference reads every byte before the count otherwise)
    docs.sparkSession.read.schema(out.schema).json(path).count()
  }

  /** Group-coherent train/validation split with a per-group document
    * quota. The split key is the GROUP (site, source, domain), not the
    * document: hashing doc ids would scatter near-identical pages of one
    * site across train and validation and leak. The quota caps any one
    * group's contribution (anti-domination), keeping the `quota`
    * hash-smallest documents — a deterministic uniform subsample of the
    * group, not its head.
    *
    * SCALE: one window keyed by the group column for the quota rank, one
    * scan-speed hash predicate for the split label. Mega-group skew is
    * bounded by Spark's rank-limit pushdown: the executed plan shows a
    * PARTIAL WindowGroupLimit before the exchange, so every map
    * partition forwards at most `quota` rows per group and the post-
    * shuffle sort sees at most quota x upstream-partitions rows for even
    * the hottest group. */
  def domainSplit(docs: DataFrame, groupCol: String, quota: Int,
      valPct: Int, salt: String, idCol: String = "doc_id"): DataFrame = {
    val docKey = graft.expressions.PortableHash.md5Hash60(
      concat(lit(salt + ":"), col(idCol)))
    val w = Window.partitionBy(groupCol).orderBy(col("doc_key"), col(idCol))
    docs.select(col(idCol), col(groupCol), docKey.as("doc_key"))
      .withColumn("rk", row_number().over(w))
      .where(col("rk") <= quota)
      .withColumn("split",
        when(pmod(graft.expressions.PortableHash.md5Hash60(
          concat(lit(salt + ":"), col(groupCol))), lit(100L)) < valPct,
          lit("val")).otherwise(lit("train")))
      .select(col(idCol), col(groupCol), col("split"))
  }

  /** Corpus selection under a GLOBAL token budget: keep the best documents
    * (priority = `n_chars` desc, doc_id tiebreak) whose cumulative token
    * count stays within `budgetTokens` — the "how much of the crawl fits
    * this training run" cut. Returns (doc_id, n_tok, cum_tok) for the
    * selected prefix of the priority order; the result is a prefix of a
    * TOTAL order, so it is independent of partitioning and oracles
    * exactly against a window cumsum.
    *
    * SCALE: a global cumulative sum is the textbook one-partition-window
    * trap (`ORDER BY` window with no PARTITION BY collapses the corpus
    * onto one task). This is the classic two-phase prefix sum instead:
    * (1) range-partition by the priority key — parallel, balanced by
    * sampled boundaries; (2) one tiny pass summing each partition's
    * tokens (one row per PARTITION collected — bounded by the partition
    * count, never the data); (3) per-partition running sums + the
    * broadcast exclusive prefix offsets give every row its exact global
    * cumulative position with zero additional shuffles. Partitions whose
    * offset already exceeds the budget short-circuit without reading
    * rows; within a partition the monotone cum allows takeWhile early
    * exit. The ranged projection is localCheckpoint'd because
    * repartitionByRange SAMPLES its boundaries — the two passes must see
    * identical partitions (and it pins 3 long columns per doc, not the
    * text). */
  def selectUnderBudget(docs: DataFrame, budgetTokens: Long,
      partitions: Int = 0): DataFrame = {
    val spark = docs.sparkSession
    import spark.implicits._
    val base = docs.select(col("doc_id").cast("long").as("doc_id"),
      col("n_chars").cast("long").as("n_chars"),
      size(split(col("text"), " ")).cast("long").as("tok"))
    val p = DistributedRank.prepare(base, Nil,
      Seq(col("n_chars").desc, col("doc_id")), Seq("tok"), partitions)
    val bc = p.bc
    // offsets are keyed by RANGED's partition number: take the RDD's own
    // split index (stable under downstream union/coalesce), never
    // TaskContext.getPartitionId() — the q472 composition failure class
    spark.createDataset(p.ranged.rdd.mapPartitionsWithIndex { (pid, it) =>
      // partitions whose offset already exceeds the budget short-circuit
      // without reading rows; within one, the monotone cum allows
      // takeWhile early exit
      val start = bc.value.offsets.get((pid, Nil)).fold(0L)(_(0))
      if (start >= budgetTokens) Iterator.empty
      else {
        var cum = start
        it.map { r => val tok = r.getLong(2); cum += tok
          (r.getLong(0), tok, cum) }
          .takeWhile(_._3 <= budgetTokens)
      }
    }).toDF("doc_id", "n_tok", "cum_tok")
  }

  /** Compaction bin-packing plan: next-fit by byte budget — each doc
    * (in doc_id order) lands in bin = exclusive-prefix-bytes div
    * `binBytes`, the streaming chunker applied to FILE layout planning.
    * Returns the per-bin report (bin, n_files, bytes, first_doc,
    * last_doc), all exact integer arithmetic.
    *
    * SCALE: the naive form is a global `ORDER BY doc_id` window cumsum —
    * the one-partition trap. This is [[selectUnderBudget]]'s two-phase
    * distributed prefix sum keyed by doc_id: range-partition, one tiny
    * per-partition byte-sum pass (one row per PARTITION to the driver),
    * broadcast exclusive offsets, then every row computes its exact
    * global prefix and bin locally with zero further wide exchanges
    * before the bin-count-sized aggregate. */
  def packBins(docs: DataFrame, binBytes: Long,
      partitions: Int = 0): DataFrame = {
    require(binBytes > 0, s"binBytes=$binBytes must be positive")
    DistributedRank.prefixSum(
        docs.select(col("doc_id").cast("long").as("doc_id"),
          col("n_chars").cast("long").as("n_chars")),
        Nil, Seq(col("doc_id")), Seq("n_chars" -> "pre"),
        inclusive = false, partitions = partitions)
      // the exclusive prefix decides the bin (both operands nonnegative,
      // so SQL `div` == the prior Scala long `/`)
      .select(expr(s"pre div $binBytes").as("bin"),
        col("doc_id"), col("n_chars"))
      .groupBy("bin").agg(count(lit(1)).cast("long").as("n_files"),
        sum(col("n_chars")).cast("long").as("bytes"),
        min(col("doc_id")).as("first_doc"),
        max(col("doc_id")).as("last_doc"))
      .orderBy("bin")
  }

  /** Source-balanced corpus selection (the RefinedWeb/Dolma "no single
    * domain dominates" cut): within EACH source keep the priority-ordered
    * prefix (`n_chars` desc, doc_id) whose cumulative token count fits
    * `budgetTokens` — a per-source budget rather than [[selectUnderBudget]]'s
    * global one. Returns (source, doc_id, n_tok, cum_tok) for the kept
    * rows; each source's result is a prefix of a total order, so it is
    * independent of partitioning.
    *
    * SCALE: the tempting form — a source-keyed window cumsum — puts each
    * source's ENTIRE history on one task, and real corpora are exactly the
    * workload where one source (the web crawl) is 90% of the mass. This
    * instead extends [[selectUnderBudget]]'s two-phase prefix sum with a
    * source dimension: range-partition by (source, priority) — a hot
    * source SPANS partitions instead of collapsing onto one — then one
    * tiny pass collects per-(partition, source) token sums (bounded by
    * partitions + sources-at-boundaries, never rows), the driver folds
    * them into exclusive per-source offsets, and the second pass gives
    * every row its exact in-source cumulative position with zero further
    * shuffles. */
  def selectPerSourceBudget(docs: DataFrame, budgetTokens: Long,
      sourceCol: String = "source", partitions: Int = 0): DataFrame = {
    val spark = docs.sparkSession
    import spark.implicits._
    val base = docs.select(col(sourceCol).cast("string").as("__src"),
      col("doc_id").cast("long").as("doc_id"),
      col("n_chars").cast("long").as("n_chars"),
      size(split(col("text"), " ")).cast("long").as("tok"))
    val p = DistributedRank.prepare(base, Seq("__src"),
      Seq(col("n_chars").desc, col("doc_id")), Seq("tok"), partitions)
    val bc = p.bc
    // RDD-delivered split index, not TaskContext.getPartitionId() — see
    // selectUnderBudget (the q472 composition failure class)
    spark.createDataset(p.ranged.rdd.mapPartitionsWithIndex { (pid, it) =>
      // a 'seen any row yet' flag, NOT a null sentinel: a null source
      // value must still trigger its offset load on the first row
      var started = false
      var cur: String = null
      var cum = 0L
      it.flatMap { r =>
        val s = r.getString(0)
        if (!started || s != cur) {
          started = true; cur = s
          cum = bc.value.offsets.get((pid, List(s))).fold(0L)(_(0))
        }
        val tok = r.getLong(3)
        cum += tok
        if (cum <= budgetTokens) Iterator((s, r.getLong(1), tok, cum))
        else Iterator.empty
      }
    }).toDF("source", "doc_id", "n_tok", "cum_tok")
  }

  /** Coverage-targeted vocabulary: the SMALLEST set of top-frequency
    * terms whose counts cover at least `coveragePermille`/1000 of the
    * corpus token mass (the crossing term is included) — how word-level
    * vocabs and BPE alphabet cutoffs are actually sized. Ties order by
    * term so the cut is deterministic.
    *
    * SCALE: the same two-phase distributed prefix sum as
    * [[selectUnderBudget]], applied to the VOCAB relation: range
    * partition by (cnt desc, term), per-partition sums to the driver
    * (one row per partition — bounded by partition count, never data),
    * exclusive offsets broadcast back, partitions past the target
    * short-circuit. No one-partition window anywhere; the only
    * driver-side values are the partition sums and the single total. */
  def vocabCoverage(docs: DataFrame, coveragePermille: Int,
      textCol: String = "text", partitions: Int = 0): DataFrame = {
    val spark = docs.sparkSession
    import spark.implicits._
    val counts = docs
      .select(explode(TextAnalysis.tokens(col(textCol))).as("term"))
      .groupBy("term").agg(count(lit(1)).cast("long").as("cnt"))
    val p = DistributedRank.prepare(counts, Nil,
      Seq(col("cnt").desc, col("term")), Seq("cnt"), partitions)
    val target = (p.total(0) * coveragePermille + 999) / 1000
    val bc = p.bc
    // RDD-delivered split index, not TaskContext.getPartitionId() — see
    // selectUnderBudget (the q472 composition failure class)
    spark.createDataset(p.ranged.rdd.mapPartitionsWithIndex { (pid, it) =>
      var cum = bc.value.offsets.get((pid, Nil)).fold(0L)(_(0))
      if (cum >= target) Iterator.empty
      else it.map { r =>
        val c = r.getLong(1)
        val before = cum; cum += c; (r.getString(0), c, cum, before)
      }.takeWhile(_._4 < target).map(x => (x._1, x._2, x._3))
    }).toDF("term", "cnt", "cum_cnt")
  }

  /** Inverted index over the corpus: term -> sorted posting list of the
    * documents containing it, plus the document frequency — the retrieval
    * primitive behind decontamination lookups, RAG-style search, and df
    * statistics.
    *
    * SCALE: ONE shuffle keyed by term — `collect_set` dedups doc ids in
    * the partial (map-side) aggregate, so repeated terms within a doc
    * never cross the wire more than once. Posting lists are bounded by
    * corpus df; for web corpora pass `maxDf` so stopword-grade terms
    * (df ~ corpus size) never materialize a corpus-sized aggregation
    * buffer: the cutoff variant counts df FIRST (Expand-based distinct
    * agg — partial phase keys on (term, doc), buffers stay bounded),
    * left-semi-joins the surviving terms, and only then builds posting
    * lists, so every `collect_set` buffer is <= maxDf by construction
    * (the q77 hot-set argument). The join and the final groupBy share
    * the term hash partitioning, so the postings build adds no extra
    * exchange over the join. */
  /** Skip-gram training-pair extraction (Mikolov et al. 2013 §3, the
    * DATA side of word2vec): for every token position, the ±`window`
    * in-bounds neighbors become (center, context, label=1) pairs, plus
    * one DETERMINISTIC in-document negative per center — the token at
    * position md5₆₀(doc#pos) mod len, label 0 (in-batch-style negative
    * sampling with zero RNG state; a negative that happens to equal a
    * true context keeps label 0, the standard convention). This is the
    * materialization a downstream embedding trainer streams.
    *
    * SCALE: one scan-speed projection per offset (the offsets are a
    * literal explode, not a self-join) — no shuffle at all until the
    * caller aggregates. Output ordered by the caller. */
  def skipgramPairs(docs: DataFrame, window: Int = 2,
      idCol: String = "doc_id", textCol: String = "text"): DataFrame = {
    val toks = docs.select(col(idCol).as("did"),
      TextAnalysis.tokens(col(textCol)).as("t"))
    val offsets = (-window to window).filter(_ != 0)
    val pos = toks.select(col("did"), col("t"),
      posexplode(col("t")).as(Seq("pos", "center")))
    val positives = pos.select(col("did"), col("t"), col("pos"),
        col("center"), explode(array(offsets.map(o => lit(o)): _*)).as("off"))
      .where(col("pos") + col("off") >= 0 &&
        col("pos") + col("off") < size(col("t")))
      .select(col("did"), col("pos"), col("center"),
        element_at(col("t"), col("pos") + col("off") + 1).as("context"),
        lit(1L).as("label"))
    val negatives = pos.select(col("did"), col("pos"), col("center"),
      element_at(col("t"),
        (pmod(graft.expressions.PortableHash.md5Hash60(
          concat(col("did"), lit("#"), col("pos"))), size(col("t"))) + 1)
          .cast("int")).as("context"),
      lit(0L).as("label"))
    positives.unionByName(negatives)
  }

  /** Phrase query through a POSITIONAL inverted index: build
    * (doc_id, term, pos), elect the corpus's top adjacent bigram
    * (count desc, then lexicographic — fully deterministic), then
    * answer the phrase query the way a search index does: probe the
    * postings of w1, join the postings of w2 at pos+1 in the same doc.
    * Output: one row (w1, w2, n_occurrences, n_docs) — the occurrence
    * count provably equals the election count, which is the index
    * correctness statement the register row hashes.
    *
    * SCALE: the index is one posexplode projection; the phrase probe
    * joins two TERM-FILTERED postings lists (the broadcast 1-row query
    * prunes the scan before the join) keyed on (doc, pos) — work is the
    * postings of the two query terms, never the corpus product. */
  def phraseSearchTopBigram(docs: DataFrame, idCol: String = "doc_id",
      textCol: String = "text"): DataFrame = {
    val pos = docs.select(col(idCol).as("did"),
      posexplode(TextAnalysis.tokens(col(textCol))).as(Seq("pos", "term")))
      .localCheckpoint() // feeds the election + both probe sides
    val top = pos.as("p1")
      .join(pos.as("p2"),
        col("p1.did") === col("p2.did") &&
          col("p2.pos") === col("p1.pos") + 1)
      .groupBy(col("p1.term").as("w1"), col("p2.term").as("w2"))
      .agg(count(lit(1)).as("n"))
      .orderBy(col("n").desc, col("w1"), col("w2"))
      .limit(1)
    pos.as("i1")
      .join(broadcast(top), col("i1.term") === col("w1"))
      .join(pos.as("i2"),
        col("i2.did") === col("i1.did") && col("i2.term") === col("w2") &&
          col("i2.pos") === col("i1.pos") + 1)
      .groupBy("w1", "w2")
      .agg(count(lit(1)).cast("long").as("n_occurrences"),
        countDistinct(col("i1.did")).cast("long").as("n_docs"))
  }

  def invertedIndex(docs: DataFrame, idCol: String = "doc_id",
      textCol: String = "text", maxDf: Option[Long] = None): DataFrame = {
    val pairs = docs.select(
      explode(TextAnalysis.tokens(col(textCol))).as("term"), col(idCol))
    val kept = maxDf match {
      case None => pairs
      case Some(cut) =>
        val dfs = pairs.groupBy("term")
          .agg(countDistinct(col(idCol)).as("df"))
        pairs.join(dfs.filter(col("df") <= cut).select("term"),
          Seq("term"), "left_semi")
    }
    kept.groupBy("term")
      .agg(sort_array(collect_set(col(idCol))).as("postings"))
      .withColumn("df", size(col("postings")))
  }

  /** INTRA-document repeated-chunk removal — the within-doc half of
    * repetition cleanup (the cross-corpus half is [[removeBoilerplate]]):
    * split each document into non-overlapping `segTokens`-token chunks and
    * keep only each chunk content's FIRST occurrence within its own
    * document (looping scraped pages, duplicated boilerplate blocks,
    * copy-paste runs).
    *
    * SCALE: zero shuffles, zero explodes — the whole operation is array
    * higher-order functions on the text column (`transform` over a
    * `sequence` of chunk indices, `filter` on first-occurrence via
    * `array_position`, `array_join` to rebuild), so it runs at scan speed
    * inside whole-stage codegen and composes into any pipeline for free.
    * Contrast with [[removeBoilerplate]]'s explode + window, which must
    * shuffle because its duplicate test is CORPUS-wide. */
  def dedupRepeatedChunks(docs: DataFrame, segTokens: Int,
      idCol: String = "doc_id", textCol: String = "text"): DataFrame = {
    val toks = TextAnalysis.tokens(col(textCol))
    val nChunks = ceil(size(toks).cast("double") / segTokens).cast("int")
    val chunks = transform(sequence(lit(0), nChunks - 1),
      i => array_join(slice(toks, i * segTokens + 1, lit(segTokens)), " "))
    docs.select(col(idCol),
      array_join(
        filter(chunks, (c, i) => array_position(chunks, c) === i + 1),
        " ").as("clean_text"))
  }

  /** BM25 ranked retrieval — the scoring end of [[invertedIndex]]'s
    * retrieval story (Robertson/Sparck-Jones idf with Lucene's +1 floor,
    * so scores stay positive even for terms in most docs).
    *
    * SCALE: the token explode is filtered to the QUERY's terms before
    * anything shuffles, so the per-(doc,term) tf aggregation moves
    * |q| * df rows, not the corpus; df and the corpus length stats are
    * tiny aggregates broadcast back (single-row / |q|-row build sides);
    * the final top-k is an orderBy+limit the planner runs as
    * TakeOrderedAndProject — no global sort materializes. The aggregated
    * tf (bounded by |q| * N rows, three narrow columns) is materialized
    * with localCheckpoint so the df branch derives from it instead of
    * re-scanning and re-exploding the corpus (column pruning would
    * otherwise specialize the two subtrees apart and defeat exchange
    * reuse). One corpus explode total; the avgdl pass reads only the
    * text column, shuffle-free. Ranking ties break on the ROUNDED score
    * then doc_id, so the cut at `topK` is deterministic across engines
    * and float-summation orders. For repeated queries against a static
    * corpus, persist the (term, doc, tf, dl) table once (q90's inverted
    * index) instead of re-running the scan per query. */
  def bm25(docs: DataFrame, queryTerms: Seq[String], topK: Int,
      k1: Double = 1.2, b: Double = 0.75,
      idCol: String = "doc_id", textCol: String = "text"): DataFrame = {
    val toks = docs.select(col(idCol), TextAnalysis.tokens(col(textCol)).as("w"))
    val stats = toks.agg(avg(size(col("w"))).as("avgdl"),
      count(lit(1)).cast("double").as("n"))
    val tf = toks
      .select(col(idCol), size(col("w")).cast("double").as("dl"),
        explode(col("w")).as("term"))
      .where(col("term").isin(queryTerms: _*))
      .groupBy(col(idCol), col("term"))
      .agg(count(lit(1)).cast("double").as("tf"), first(col("dl")).as("dl"))
      .localCheckpoint(eager = false)
    val df = tf.groupBy("term").agg(count(lit(1)).cast("double").as("df"))
    tf.join(broadcast(df), Seq("term"))
      .join(broadcast(stats))
      .withColumn("idf", log((col("n") - col("df") + 0.5) / (col("df") + 0.5) + 1))
      .withColumn("w_td", col("idf") * col("tf") * (k1 + 1) /
        (col("tf") + (col("dl") / col("avgdl") * b + (1 - b)) * k1))
      .groupBy(col(idCol))
      .agg(round(sum(col("w_td")), 4).as("score"))
      .orderBy(col("score").desc, col(idCol))
      .limit(topK)
  }

  /** Unigram-LM surprisal scoring — the statistical half of a
    * CCNet-style quality filter: fit a unigram model on the corpus itself
    * (p(w) = count(w)/total) and score each document by its
    * cross-entropy in bits/token. Template spam scores low, rare-token
    * noise scores high; filters band-pass the middle.
    *
    * SCALE: two tokenize passes (the q83 trade — cheaper than carrying
    * exploded tokens through a wide plan): pass one builds the
    * term->count model with map-side partial aggregation; pass two
    * re-explodes and joins tokens to the model on the term key. The model
    * is vocab-sized, NOT corpus-sized, but a web-scale vocab (hundreds of
    * millions of tails) is not a-priori driver-sized, so the model
    * carries NO broadcast hint: the planner/AQE broadcast it only when
    * its measured size is small, and a large vocab degrades to a shuffle
    * join — the q77 hot-set argument (spec-asserted under a disabled
    * broadcast threshold). The total
    * token count is a single-row aggregate off the un-exploded scan
    * (size(tokens), no shuffle) broadcast into the score — NOT an
    * unpartitioned window over the vocab, which would funnel every model
    * row through one task. */
  def unigramSurprisal(docs: DataFrame,
      idCol: String = "doc_id", textCol: String = "text"): DataFrame = {
    val toks = docs.select(col(idCol),
      explode(TextAnalysis.tokens(col(textCol))).as("term"))
    val model = toks.groupBy("term").agg(count(lit(1)).as("cnt"))
    val total = docs.agg(
      sum(size(TextAnalysis.tokens(col(textCol)))).cast("double").as("total"))
    val logTwo = math.log(2.0)
    toks.join(model, Seq("term"))
      .join(broadcast(total))
      .groupBy(col(idCol))
      .agg(count(lit(1)).cast("long").as("n_tok"),
        round(avg(-log(col("cnt").cast("double") / col("total")) / logTwo), 4)
          .as("bits_per_tok"))
  }

  /** Bigram-LM surprisal — the sharper statistical half of a CCNet-style
    * quality filter: fit an interpolated bigram model on the corpus
    * itself, p(w2|w1) = λ·c(w1w2)/c(w1) + (1-λ)·c(w2)/T, and score each
    * document by its bigram cross-entropy in bits/token. Catches
    * word-salad that unigram surprisal ([[unigramSurprisal]]) can't:
    * shuffled common words keep their unigram score but lose their
    * bigram mass. Docs with fewer than 2 tokens have no bigrams and are
    * absent from the output.
    *
    * SCALE: bigrams come from arrays_zip of two slices — no self-join,
    * no window; the pair explode is the only corpus-sized relation and
    * it shuffles once per model join. Bigram and unigram models are
    * vocab²-/vocab-sized with map-side partial aggregation; neither
    * carries a broadcast hint (the q99 argument — AQE broadcasts when
    * measured-small). Total-token count is a single-row broadcast. The
    * interpolation uses the λ literal and (1-λ) COMPUTED the same way
    * on both engine and oracle sides, so IEEE doubles agree bitwise
    * before the final rounding. */
  def bigramSurprisal(docs: DataFrame, lambda: Double = 0.7,
      idCol: String = "doc_id", textCol: String = "text"): DataFrame = {
    val toks = TextAnalysis.tokens(col(textCol))
    val pairs = docs.select(col(idCol).as("doc_id"),
      explode(arrays_zip(slice(toks, lit(1), size(toks) - 1),
        slice(toks, lit(2), size(toks) - 1))).as("bg"))
      .select(col("doc_id"), col("bg.0").as("w1"), col("bg.1").as("w2"))
    val bgc = pairs.groupBy("w1", "w2").agg(count(lit(1)).as("cbg"))
    val uni = docs.select(explode(toks).as("term"))
      .groupBy("term").agg(count(lit(1)).as("cu"))
    val total = docs.agg(sum(size(toks)).cast("double").as("total"))
    val logTwo = math.log(2.0)
    val p = lit(lambda) * col("cbg").cast("double") / col("c1") +
      lit(1.0 - lambda) * col("cu2").cast("double") / col("total")
    pairs.join(bgc, Seq("w1", "w2"))
      .join(uni.select(col("term").as("w1"), col("cu").as("c1")), Seq("w1"))
      .join(uni.select(col("term").as("w2"), col("cu").as("cu2")), Seq("w2"))
      .join(broadcast(total))
      .groupBy("doc_id")
      .agg(count(lit(1)).cast("long").as("n_bg"),
        round(avg(-log(p) / logTwo), 4).as("bits_per_tok"))
  }

  /** Deterministic MLM example generation (BERT-style): masks ~`maskPct`%
    * of tokens, emitting the masked text, the label sequence (the masked
    * tokens in position order), and the mask count. The mask decision is
    * a PORTABLE HASH of (salt, doc, position) — no RNG — so shards are
    * reproducible run-to-run, a re-run after a lost executor produces
    * identical examples, and a different `salt` yields a fresh epoch's
    * masking. (Whole-word/span masking variants change only the decision
    * input: hash the span start instead of each position.)
    *
    * SCALE: pure per-row column work (HOF transform/filter over the
    * token array) — zero shuffles, runs at scan speed inside codegen;
    * the md5-per-token cost is the deliberate price of portability
    * (xxhash64 would be ~4x cheaper but engine-specific — swap the
    * decision column at deployment if reproducibility across engines
    * stops mattering). */
  def mlmMask(docs: DataFrame, maskPct: Int = 15, salt: String = "mlm",
      idCol: String = "doc_id", textCol: String = "text"): DataFrame = {
    val toks = TextAnalysis.tokens(col(textCol))
    def masked(i: org.apache.spark.sql.Column) =
      graft.expressions.PortableHash.md5Hash60(
        concat(lit(salt + ":"), col(idCol).cast("string"), lit(":"),
          i.cast("string"))) % 100 < maskPct
    val idxs = sequence(lit(0), size(toks) - 1)
    docs.select(col(idCol),
      array_join(transform(idxs, i =>
        when(masked(i), lit("[MASK]")).otherwise(element_at(toks, i + 1))),
        " ").as("masked_text"),
      array_join(transform(filter(idxs, masked _), i =>
        element_at(toks, i + 1)), " ").as("labels"),
      size(filter(idxs, masked _)).cast("long").as("n_masked"))
  }

  /** Deterministic exact-n per-group sample: the n rows with the
    * SMALLEST portable hash of (salt, id) in each group — a uniform
    * without-replacement sample that is reproducible across runs and
    * engines, unlike rate-based sampling ([[stratifiedSample]]) which
    * can't hit an exact count. A new salt redraws the sample.
    *
    * SCALE: one rank window per group; for groups so large the
    * per-group sort hurts, the bounded-buffer alternative is
    * [[TopK.topKByScore]] keyed on the hash (same result, heap-bounded
    * memory, no sort) — this form keeps the window so the cross-engine
    * oracle states the identical ordering. */
  def groupSampleExactN(df: DataFrame, n: Int, salt: String,
      groupCol: String = "source", idCol: String = "doc_id"): DataFrame = {
    val h = graft.expressions.PortableHash.md5Hash60(
      concat(lit(salt + ":"), col(idCol)))
    val w = Window.partitionBy(col(groupCol)).orderBy(h.asc, col(idCol).asc)
    df.withColumn("__rn", row_number().over(w))
      .where(col("__rn") <= n).drop("__rn")
  }

  /** Deterministic WEIGHTED sampling without replacement, `n` winners per
    * group (Efraimidis & Spirakis 2006, the exponential-race form): each
    * row draws u ∈ (0,1] from the portable md5 hash and races with key
    * −ln(u)/w — the n smallest keys per group are a weight-proportional
    * without-replacement sample. [[groupSampleExactN]]'s uniform draw is
    * the w≡1 special case; this is the corpus-subsampling knob when
    * longer/higher-quality documents should win proportionally more
    * often. The draw depends only on (salt, id), so reruns and both
    * engines select identical rows; keys are continuous doubles, so a
    * cross-engine ln() ulp can only matter if two keys collide to
    * within an ulp — and the trailing id sort key breaks even that.
    *
    * SCALE: one codegen'd key projection + one per-group top-n (window
    * rank, WindowGroupLimit-pruned map-side before the group shuffle).
    * Weights must be positive; rows with w <= 0 are dropped (they can
    * never win a weighted race). */
  def weightedSampleK(df: DataFrame, n: Int, salt: String,
      weightCol: String = "n_chars", groupCol: String = "source",
      idCol: String = "doc_id"): DataFrame = {
    val u = (graft.expressions.PortableHash.md5Hash60(
      concat(lit(salt + ":"), col(idCol))).cast("double") + 1.0) /
      1152921504606846976.0 // 2^60: u in (0, 1]
    val key = -log(u) / col(weightCol).cast("double")
    val w = Window.partitionBy(col(groupCol)).orderBy(key.asc, col(idCol).asc)
    df.where(col(weightCol) > 0)
      .withColumn("__rn", row_number().over(w))
      .where(col("__rn") <= n).drop("__rn")
  }

  /** Deterministic stratified train/val/test split with EXACT per-stratum
    * proportions: within each stratum rows are ranked by the portable md5
    * draw and the first ⌊trainFrac·n⌋ become `train`, the next
    * ⌊valFrac·n⌋ `val`, the rest `test`. Hash-threshold splits (q66
    * shape) only hit the fractions in expectation; the rank-vs-count
    * form is what evaluation protocols need — per-stratum counts exact
    * to the floor, assignment still a pure function of (salt, id, the
    * stratum's membership).
    *
    * SCALE: one window rank + one count over the same stratum
    * partitioning (a single shuffle by stratum); the split label is a
    * scan-speed comparison against the two floor thresholds. */
  def stratifiedSplit(df: DataFrame, trainFrac: Double, valFrac: Double,
      salt: String, stratumCol: String = "source",
      idCol: String = "doc_id"): DataFrame = {
    require(trainFrac > 0 && valFrac >= 0 && trainFrac + valFrac < 1.0,
      "fractions must leave room for a test split")
    val h = graft.expressions.PortableHash.md5Hash60(
      concat(lit(salt + ":"), col(idCol)))
    val byStratum = Window.partitionBy(col(stratumCol))
    val rnk = Window.partitionBy(col(stratumCol)).orderBy(h.asc, col(idCol).asc)
    df.withColumn("__rn", row_number().over(rnk))
      .withColumn("__n", count(lit(1)).over(byStratum))
      .withColumn("split",
        when(col("__rn") <= floor(col("__n") * trainFrac), "train")
          .when(col("__rn") <= floor(col("__n") * trainFrac) +
            floor(col("__n") * valFrac), "val")
          .otherwise("test"))
      .drop("__rn", "__n")
  }

  /** Per-source distribution drift: KL(P_source || P_corpus) in bits
    * over unigram term distributions — the monitoring statistic that
    * flags a source whose language shifted relative to the corpus
    * (crawl rot, template takeover, language drift). No smoothing
    * needed: every source term exists in the corpus by construction.
    *
    * SCALE: ONE corpus tokenize feeding a (source, term) count; the
    * per-source totals AND the corpus term counts both derive from that
    * vocab-sized aggregate (no second explode). The term join carries
    * no broadcast hint (web-scale vocab — the q99 argument); the corpus
    * total is a single-row broadcast. */
  def sourceDrift(docs: DataFrame, groupCol: String = "source",
      textCol: String = "text"): DataFrame = {
    val toks = docs.select(col(groupCol).as("g"),
      explode(TextAnalysis.tokens(col(textCol))).as("term"))
    // sc feeds THREE consumers (per-source totals, corpus counts, the
    // final join) — materialize it so the corpus explode+shuffle runs
    // once, not once per consumer (the q121 seam argument)
    val sc = toks.groupBy("g", "term").agg(count(lit(1)).as("cs"))
      .localCheckpoint()
    val stot = sc.groupBy("g").agg(sum("cs").as("ts"))
    val cc = sc.groupBy("term").agg(sum("cs").as("cc"))
    val ctot = cc.agg(sum("cc").cast("double").as("tc"))
    val ps = col("cs").cast("double") / col("ts")
    val pc = col("cc").cast("double") / col("tc")
    val logTwo = math.log(2.0)
    sc.join(stot, Seq("g")).join(cc, Seq("term")).join(broadcast(ctot))
      .groupBy(col("g").as(groupCol))
      .agg(max(col("ts")).cast("long").as("n_tokens"),
        round(sum(ps * log(ps / pc)) / logTwo, 4).as("kl_bits"))
  }

  /** T5-style span corruption (Raffel et al. 2020): deterministic span
    * masking where each position starts a `spanLen`-token span with
    * probability `startPermille`/1000 (decided by a portable hash of
    * (salt, doc, position) — no RNG, reproducible epochs like
    * [[mlmMask]]). Adjacent/overlapping spans merge into one run; each
    * masked RUN is replaced in the corrupted text by one indexed
    * sentinel `<extra_id_k>`, and the target sequence lists each
    * sentinel followed by the tokens it hides — the exact seq2seq
    * denoising objective shape.
    *
    * SCALE: pure per-row HOF column work over precomputed mask/run
    * arrays (each hash computed once; the run-index prefix count is
    * O(len²) on BOOLEANS, not hashes) — zero shuffles, scan-speed. */
  def spanCorrupt(docs: DataFrame, spanLen: Int = 3, startPermille: Int = 50,
      salt: String = "t5", idCol: String = "doc_id",
      textCol: String = "text"): DataFrame = {
    val toks = TextAnalysis.tokens(col(textCol))
    def isStart(j: org.apache.spark.sql.Column) =
      graft.expressions.PortableHash.md5Hash60(
        concat(lit(salt + ":"), col(idCol).cast("string"), lit(":"),
          j.cast("string"))) % 1000 < startPermille
    val idxs = sequence(lit(0), size(col("w")) - 1)
    val sent = (p: org.apache.spark.sql.Column) => concat(lit("<extra_id_"),
      element_at(col("sidx"), p + 1).cast("string"), lit(">"))
    docs.select(col(idCol), toks.as("w"))
      .withColumn("msk", transform(idxs, p =>
        size(filter(sequence(greatest(p - (spanLen - 1), lit(0)), p),
          j => isStart(j))) > 0))
      .withColumn("rs", transform(idxs, p =>
        when(p === 0, element_at(col("msk"), 1))
          .otherwise(element_at(col("msk"), p + 1) &&
            !element_at(col("msk"), p))))
      .withColumn("sidx", transform(idxs, p =>
        size(filter(slice(col("rs"), lit(1), p), x => x))))
      .select(col(idCol),
        array_join(filter(transform(idxs, p =>
          when(!element_at(col("msk"), p + 1), element_at(col("w"), p + 1))
            .when(element_at(col("rs"), p + 1), sent(p))
            .otherwise(lit(null))), x => x.isNotNull), " ").as("corrupted"),
        array_join(filter(transform(idxs, p =>
          when(element_at(col("rs"), p + 1),
            concat(sent(p), lit(" "), element_at(col("w"), p + 1)))
            .when(element_at(col("msk"), p + 1), element_at(col("w"), p + 1))
            .otherwise(lit(null))), x => x.isNotNull), " ").as("targets"),
        size(filter(col("msk"), x => x)).cast("long").as("n_masked"))
  }

  /** Cross-document duplicate-SPAN removal (Lee et al. 2022,
    * "Deduplicating Training Data Makes Language Models Better"): any
    * `windowTokens`-token window whose exact text occurs more than once
    * in the corpus is stripped from every occurrence except the first
    * (lexicographically smallest (doc_id, pos)). Overlapping removal
    * spans within a doc are merged before the text is rebuilt, so a long
    * shared boilerplate run collapses to one island instead of W near-
    * identical cuts. Returns (doc_id, clean_text, removed-token count)
    * for EVERY input doc.
    *
    * SCALE: duplicate detection is ONE corpus-wide groupBy on the gram;
    * the span join shuffles on the same gram key. The two gram subtrees
    * are NOT exchange-reusable (the dup side partial-aggregates below
    * its shuffle — executed plan verified), and that trade is right:
    * map-side combine collapses repeated grams before they move, which
    * outweighs re-running the scan-side explode. The keeper min(struct)
    * plans as SortAggregate (struct buffers aren't hash-aggregable) —
    * the sort is per-partition on the gram only. At 100 TB, group on a
    * 64-bit hash of the gram instead of its text
    * ([[graft.expressions.PortableHash]]) to cut shuffle width ~10x (a
    * 2^-60 collision erroneously drops one span — acceptable for data
    * prep; this form keeps the text so the cross-engine oracle can
    * reproduce it). Island-merge windows are partitioned per doc and
    * bounded by that doc's span count; the text rebuild is a doc-keyed
    * left join plus a higher-order filter, no per-row UDF. */
  def removeDuplicateSpans(docs: DataFrame, windowTokens: Int,
      idCol: String = "doc_id", textCol: String = "text"): DataFrame = {
    val w = windowTokens
    val base = docs.select(col(idCol).as("doc_id"),
      TextAnalysis.tokens(col(textCol)).as("w"))
    // guard: sequence(0, n) with n < 0 counts DOWN in Spark — empty out
    // short docs explicitly instead
    val grams = base.select(col("doc_id"),
      posexplode(when(size(col("w")) >= w,
        transform(sequence(lit(0), size(col("w")) - w),
          i => array_join(slice(col("w"), i + 1, lit(w)), " ")))
        .otherwise(expr("cast(array() as array<string>)"))))
      .toDF("doc_id", "pos", "gram")
    val dups = grams.groupBy("gram")
      .agg(count(lit(1)).as("cnt"),
        min(struct(col("doc_id"), col("pos"))).as("keep"))
      .where(col("cnt") > 1)
    val spans = grams.join(dups, "gram")
      .where(!(col("doc_id") === col("keep.doc_id") &&
        col("pos") === col("keep.pos")))
      .select(col("doc_id"), col("pos").as("s"), (col("pos") + w - 1).as("e"))
    exciseSpans(base, spans)
  }

  /** Shared span-excision tail: merge overlapping/adjacent removal spans
    * per document into islands, then rebuild each document's text minus
    * the excised token indices. `base` is (doc_id, w: array<string>);
    * `spans` is (doc_id, s, e) token-index intervals (inclusive; e past
    * the end is harmless — the rebuild filter only ranges over real
    * indices). Returns (doc_id, clean_text, removed) for EVERY base doc.
    *
    * SCALE: the island-merge windows are partitioned per doc and bounded
    * by that doc's span count (spans are rare by construction in both
    * callers); the rebuild is a doc-keyed left join plus higher-order
    * filters — no per-row UDF, no extra shuffle beyond the doc key. */
  private[graft] def exciseSpans(base: DataFrame, spans: DataFrame): DataFrame = {
    val ord = Window.partitionBy("doc_id").orderBy("s", "e")
    val prev = ord.rowsBetween(Window.unboundedPreceding, -1)
    val merged = spans
      .withColumn("brk",
        when(col("s") > coalesce(max(col("e")).over(prev), lit(-1)), 1)
          .otherwise(0))
      .withColumn("grp", sum(col("brk")).over(ord))
      .groupBy("doc_id", "grp").agg(min("s").as("s"), max("e").as("e"))
      .groupBy("doc_id")
      .agg(collect_list(struct(col("s"), col("e"))).as("sp"))
    base.join(merged, Seq("doc_id"), "left")
      .withColumn("sp",
        coalesce(col("sp"), expr("cast(array() as array<struct<s:int,e:int>>)")))
      .withColumn("kept", filter(sequence(lit(0), size(col("w")) - 1),
        i => !exists(col("sp"), sp => i >= sp("s") && i <= sp("e"))))
      .select(col("doc_id"),
        array_join(transform(col("kept"), i => element_at(col("w"), i + 1)), " ")
          .as("clean_text"),
        (size(col("w")) - size(col("kept"))).cast("long").as("removed"))
  }

  /** GPT-3/PaLM-style benchmark decontamination with SPAN EXCISION (the
    * GPT-3 appendix-C recipe: excise the overlapping n-gram span plus a
    * `margin`-token buffer on each side, KEEP the document) — the
    * surgical alternative to [[contaminatedIds]]' whole-document drop: a
    * single leaked benchmark sentence no longer costs an entire long
    * document. Returns (doc_id, clean_text, removed) for every corpus
    * document; uncontaminated docs pass through with removed = 0.
    * Default n = 13 is the GPT-3/PaLM contamination window.
    *
    * SCALE: the benchmark side collapses to DISTINCT 64-bit gram hashes
    * and is BROADCAST (benchmark sets are tiny next to a training
    * corpus), so detection is a map-side semi-join probe at scan speed —
    * the corpus never shuffles to find its hits. Grams probe as xxhash64
    * of the space-joined window (a 2^-64 collision excises one spurious
    * span — acceptable for data prep, the [[Dedup]] argument), so the
    * broadcast is 8 bytes per benchmark gram, ~10x narrower than the
    * text. Only the HIT spans (rare by construction) enter the
    * [[exciseSpans]] island-merge windows; everything downstream of
    * detection is bounded by the contamination count, not the corpus. */
  def exciseContamination(docs: DataFrame, benchmark: DataFrame, n: Int = 13,
      margin: Int = 0, idCol: String = "doc_id",
      textCol: String = "text"): DataFrame = {
    val base = docs.select(col(idCol).as("doc_id"),
      TextAnalysis.tokens(col(textCol)).as("w"))
    // guard: sequence(0, n) with n < 0 counts DOWN in Spark — empty out
    // short docs explicitly instead
    def posGramHashes(df: DataFrame): DataFrame =
      df.select(col("doc_id"),
        posexplode(when(size(col("w")) >= n,
          transform(sequence(lit(0), size(col("w")) - n),
            i => xxhash64(array_join(slice(col("w"), i + 1, lit(n)), " "))))
          .otherwise(expr("cast(array() as array<bigint>)"))))
        .toDF("doc_id", "pos", "gh")
    val benchGrams = broadcast(
      posGramHashes(benchmark.select(lit(0L).as("doc_id"),
        TextAnalysis.tokens(col(textCol)).as("w")))
        .select("gh").distinct())
    val spans = posGramHashes(base).join(benchGrams, Seq("gh"), "left_semi")
      .select(col("doc_id"),
        greatest(col("pos") - margin, lit(0)).as("s"),
        (col("pos") + (n - 1) + margin).as("e"))
    exciseSpans(base, spans)
  }

  /** Pointwise-mutual-information co-occurring term pairs: PMI =
    * ln(P(a,b) / (P(a)P(b))) over per-document distinct-term incidence,
    * the standard collocation / related-term statistic. Per-doc terms are
    * capped at the first `maxTermsPerDoc` distinct tokens (in position
    * order) so a pathological doc can't blow up the pair space
    * quadratically; pairs below `minPairCount` are cut before scoring
    * (PMI of rare pairs is noise anyway).
    *
    * SCALE: the pair generation is a doc-keyed self-join — both sides
    * are the SAME (doc, term) subplan, so the doc_id exchange is planned
    * once and reused; per-doc cost is bounded at maxTermsPerDoc^2. Term
    * and pair counts partial-aggregate map-side. The vocabulary-count
    * join carries no broadcast hint (web-scale vocab may not be
    * driver-sized — the q99 argument); AQE broadcasts it when small.
    * Top-k is orderBy+limit = TakeOrderedAndProject, no global sort. */
  def pmiPairs(docs: DataFrame, maxTermsPerDoc: Int, minPairCount: Long,
      topK: Int, idCol: String = "doc_id", textCol: String = "text"): DataFrame = {
    val dt = docs.select(col(idCol).as("doc_id"),
      explode(slice(array_distinct(TextAnalysis.tokens(col(textCol))),
        1, maxTermsPerDoc)).as("term"))
    val tc = dt.groupBy("term").agg(count(lit(1)).as("n"))
    val nd = docs.agg(count(lit(1)).cast("double").as("nd"))
    val pc = dt.as("a").join(dt.as("b"),
        col("a.doc_id") === col("b.doc_id") && col("a.term") < col("b.term"))
      .groupBy(col("a.term").as("ta"), col("b.term").as("tb"))
      .agg(count(lit(1)).as("n_pair"))
      .where(col("n_pair") >= minPairCount)
    pc.join(broadcast(nd))
      .join(tc.select(col("term").as("ta"), col("n").as("na")), Seq("ta"))
      .join(tc.select(col("term").as("tb"), col("n").as("nb")), Seq("tb"))
      .select(col("ta"), col("tb"), col("n_pair").cast("long").as("n_pair"),
        round(log(col("n_pair").cast("double") * col("nd") /
          (col("na").cast("double") * col("nb").cast("double"))), 4).as("pmi"))
      .orderBy(col("pmi").desc, col("ta"), col("tb"))
      .limit(topK)
  }

  /** Temperature-based corpus mixture (the multilingual/multi-domain
    * sampling rule of mBERT/XLM-R, rate ∝ n^alpha): computes per-group
    * token mass, reweights it by `alpha` (alpha<1 upsamples small
    * domains), converts the target shares of `budgetTokens` into
    * per-group sampling RATES, and reports the plan next to the realized
    * deterministic-hash sample (picked docs / tokens per group). Rates
    * cap at 1.0 — a group smaller than its target is taken whole, not
    * oversampled.
    *
    * SCALE: the plan is a group-count aggregate (tiny, broadcast back);
    * membership is a scan-speed portable-hash predicate on the doc id —
    * no shuffle of the corpus, no RNG (re-runs and engines agree
    * exactly). alpha = 0.5 routes through sqrt (IEEE-exact, bit-identical
    * across engines); other alphas use pow, whose last-ulp libm drift is
    * absorbed by the rate rounding. */
  def temperatureMixture(docs: DataFrame, budgetTokens: Long, salt: String,
      alpha: Double = 0.5, groupCol: String = "source",
      idCol: String = "doc_id", textCol: String = "text"): DataFrame = {
    def weight(c: org.apache.spark.sql.Column) =
      if (alpha == 0.5) sqrt(c) else pow(c, alpha)
    val ntok = size(TextAnalysis.tokens(col(textCol))).cast("long")
    val st = docs.groupBy(col(groupCol))
      .agg(count(lit(1)).as("n_docs"), sum(ntok).as("n_tokens"))
    val tot = st.agg(sum(weight(col("n_tokens").cast("double"))).as("z"))
    val plan = st.join(broadcast(tot))
      .withColumn("rate", least(
        weight(col("n_tokens").cast("double")) / col("z") *
          budgetTokens / col("n_tokens").cast("double"),
        lit(1.0)))
    val picked = docs
      .join(broadcast(plan.select(col(groupCol), col("rate"))), Seq(groupCol))
      .where(pmod(graft.expressions.PortableHash.md5Hash60(
          concat(lit(salt + ":"), col(idCol))), lit(1000000L)) <
        floor(col("rate") * 1000000).cast("long"))
      .groupBy(col(groupCol))
      .agg(count(lit(1)).as("picked"), sum(ntok).as("picked_tokens"))
    plan.join(picked, Seq(groupCol), "left")
      .select(col(groupCol), col("n_docs").cast("long").as("n_docs"),
        col("n_tokens").cast("long").as("n_tokens"),
        round(col("rate"), 6).as("rate"),
        coalesce(col("picked"), lit(0L)).cast("long").as("picked"),
        coalesce(col("picked_tokens"), lit(0L)).cast("long")
          .as("picked_tokens"))
      .orderBy(groupCol)
  }

  /** CCNet-style perplexity bucketing: score every document with the
    * corpus-fit unigram LM ([[unigramSurprisal]]) and split the corpus
    * into `nBuckets` equal-population quality bands (CCNet's
    * head/middle/tail; Wenzek et al. 2020) — the standard coarse quality
    * label for choosing what to keep, downsample, or drop.
    *
    * Bucket assignment needs each doc's exact GLOBAL rank, which naive
    * implementations buy with a one-partition window. Here it is the
    * [[selectUnderBudget]] two-phase distributed rank: range-partition by
    * (bits, id), per-partition row COUNTS to the driver (one long per
    * partition), exclusive offsets broadcast back, rank = offset + local
    * index. Ranking on the ROUNDED score keeps the order cross-engine
    * reproducible (the q99-proven value), with doc id as the total
    * tie-break. bucket = rank*nBuckets/N in exact integer arithmetic. */
  def perplexityBuckets(docs: DataFrame, nBuckets: Int = 3,
      idCol: String = "doc_id", textCol: String = "text",
      partitions: Int = 0): DataFrame = {
    require(nBuckets > 0, s"nBuckets=$nBuckets must be positive")
    val scored = unigramSurprisal(docs, idCol, textCol)
      .select(col(idCol).cast("long").as(idCol), col("n_tok"),
        col("bits_per_tok"), lit(1L).as("one"))
    DistributedRank.prefixSum(scored, Nil,
        Seq(col("bits_per_tok"), col(idCol)), Seq("one" -> "rk"),
        inclusive = false, totals = Seq("one" -> "nn"),
        partitions = partitions)
      // 0-based rank → bucket = rank·nb div n (nonnegative: div == `/`)
      .select(col(idCol), col("n_tok"), col("bits_per_tok"),
        expr(s"(rk * ${nBuckets.toLong}) div nn").as("bucket"))
  }

  /** DSIR importance log-weights (Data Selection via Importance
    * Resampling, Xie et al. 2023): score every raw-corpus document by how
    * much it resembles a TARGET domain, using hashed word-bigram features
    * and two Laplace-smoothed bag-of-buckets models:
    *
    *   log w(doc) = Σ_g  ln p_target(bucket(g)) − ln p_raw(bucket(g))
    *
    * over the doc's bigram occurrences g (with multiplicity), where
    * p(b) = (count(b)+1) / (N+B). Selecting (or resampling) by this
    * weight steers a web-scale crawl toward the target distribution
    * without training a classifier — the production recipe behind
    * quality-targeted pre-training subsets.
    *
    * Feature hashing uses the engine-portable 60-bit md5 hash mod
    * `buckets`, so weights are reproducible across engines and runs.
    * The ln terms are composed identically on the engine and oracle
    * sides, and the per-doc sum is round()ed: cross-engine drift is
    * bounded by libm's last bit per term.
    *
    * SCALE: both models are aggregates BOUNDED BY `buckets` rows — they
    * broadcast regardless of corpus size (the parameter, not the data,
    * sizes them; same contract as q49's driver-sized centroids). The raw
    * corpus is exploded ONCE into (doc, bucket) counts; everything
    * downstream of that map-side-combinable aggregate is
    * bucket-model-sized or per-doc. Docs too short for bigrams keep
    * weight 0 (no evidence either way). */
  def dsirLogWeights(raw: DataFrame, target: DataFrame, buckets: Int,
      idCol: String = "doc_id", textCol: String = "text"): DataFrame = {
    val toks = TextAnalysis.tokens(col(textCol))
    def feat(df: DataFrame): DataFrame = df.select(col(idCol).as("doc_id"),
        explode(arrays_zip(slice(toks, lit(1), size(toks) - 1),
          slice(toks, lit(2), size(toks) - 1))).as("bg"))
      .select(col("doc_id"),
        pmod(graft.expressions.PortableHash.md5Hash60(
          concat(col("bg.0"), lit(" "), col("bg.1"))),
          lit(buckets.toLong)).as("b"))
    val rawF = feat(raw)
    // one corpus explode feeds the raw model, the raw total AND the
    // per-doc features (the q121 seam argument applied to the dominant
    // input): (doc, bucket) partial-aggregates map-side first
    val docB = rawF.groupBy("doc_id", "b").agg(count(lit(1)).as("n"))
      .localCheckpoint()
    val rawModel = docB.groupBy("b").agg(sum("n").as("cr"))
    val nr = docB.agg(sum("n").cast("double").as("nr"))
    val tgtF = feat(target)
    val tgtModel = tgtF.groupBy("b").agg(count(lit(1)).as("ct"))
    val nt = tgtF.agg(count(lit(1)).cast("double").as("nt"))
    val bD = lit(buckets.toDouble)
    val term = col("n").cast("double") *
      (log(coalesce(col("ct"), lit(0L)).cast("double") + 1.0) -
        log(col("nt") + bD) -
        log(col("cr").cast("double") + 1.0) +
        log(col("nr") + bD))
    val perDoc = docB
      .join(broadcast(rawModel), Seq("b"))
      .join(broadcast(tgtModel), Seq("b"), "left")
      .join(broadcast(nr)).join(broadcast(nt))
      .groupBy("doc_id")
      .agg(sum("n").cast("long").as("n_feat"), round(sum(term), 4).as("logw"))
    raw.select(col(idCol).as("doc_id")).join(perDoc, Seq("doc_id"), "left")
      .select(col("doc_id"),
        coalesce(col("n_feat"), lit(0L)).as("n_feat"),
        coalesce(col("logw"), lit(0.0)).as("logw"))
  }

  /** DSIR SELECTION — the resampling step of Xie et al. 2023 made
    * deterministic: keep the `n` raw-corpus documents with the highest
    * [[dsirLogWeights]] importance weight, ties broken by doc_id.
    *
    * The paper resamples stochastically (Gumbel draws over the weights),
    * which needs exp()/log() boundary behavior no two libms agree on —
    * there is no sqrt-style exactness trick for exp, so a stochastic
    * form cannot be engine-reproducible (the q111 discussion). Rank-based
    * selection on the ROUNDED logw is the deterministic contract: the
    * result is a prefix of a total order, identical across engines,
    * runs, and partitionings, and in expectation equals the paper's
    * resample as temperature → 0.
    *
    * Returns (doc_id, logw, rank) with rank 1..n in selection order.
    *
    * SCALE: the weight models are bucket-bounded broadcasts (the
    * [[dsirLogWeights]] contract); the global top-n cut is the
    * [[selectUnderBudget]] two-phase prefix pattern applied to row
    * COUNTS — range-partition by (logw desc, doc_id), one row per
    * partition to the driver, exclusive offsets broadcast back.
    * No one-partition window, no TakeOrdered driver collect of n rows;
    * partitions whose offset already exceeds `n` short-circuit. */
  def dsirSelect(raw: DataFrame, target: DataFrame, buckets: Int, n: Long,
      idCol: String = "doc_id", textCol: String = "text",
      partitions: Int = 0): DataFrame = {
    val spark = raw.sparkSession
    import spark.implicits._
    val nParts = if (partitions > 0) partitions
      else spark.sessionState.conf.numShufflePartitions
    val scored = dsirLogWeights(raw, target, buckets, idCol, textCol)
      .select(col("doc_id").cast("long"), col("logw"))
      .repartitionByRange(nParts, col("logw").desc, col("doc_id"))
      .sortWithinPartitions(col("logw").desc, col("doc_id"))
      .as[(Long, Double)]
      .localCheckpoint() // boundaries are SAMPLED: both passes must agree
    // both passes key their broadcast state by SCORED's partition number:
    // use the RDD's own split index (stable under downstream
    // union/coalesce), never TaskContext.getPartitionId() — the q472
    // composition failure class
    val scoredRdd = scored.rdd
    val partCounts = scoredRdd.mapPartitionsWithIndex { (pid, it) =>
      var c = 0L; it.foreach(_ => c += 1)
      Iterator((pid, c))
    }.collect().toMap
    val offsets = (0 until nParts).map(partCounts.getOrElse(_, 0L))
      .scanLeft(0L)(_ + _).toArray
    val bc = spark.sparkContext.broadcast(offsets)
    spark.createDataset(scoredRdd.mapPartitionsWithIndex { (pid, it) =>
      var rank = bc.value(pid)
      if (rank >= n) Iterator.empty
      else it.map { case (id, w) => rank += 1; (id, w, rank) }
        .takeWhile(_._3 <= n)
    }).toDF("doc_id", "logw", "rank")
  }

  /** Trained character-n-gram language identification — the model-based
    * upgrade of [[TextAnalysis.langId]]'s fixed marker heuristic: fit
    * per-language char-n-gram profiles on a LABELED slice, score every
    * document by add-one-smoothed log-likelihood under each language's
    * profile, take the argmax (the langid.py / fastText family recipe
    * reduced to its deterministic core).
    *
    * Model: over the `vocabSize` globally most frequent n-grams of the
    * labeled slice (count desc, gram asc — a total order, so the vocab
    * cut is reproducible), p(g|L) = (cnt_{L,g} + 1) / (tot_L + V). A
    * document scores Σ ln p(g|L) over its IN-VOCAB n-gram occurrences
    * (OOV n-grams carry no per-language signal and are dropped); the
    * winner is row 1 of (ROUNDED score desc, lang asc) — rounded FIRST,
    * the q110/q130 convention, so libm/summation-order drift can never
    * flip the argmax differently across engines. Only documents with at
    * least one in-vocab n-gram are returned (zero evidence, no argmax).
    *
    * Decomposition: Σ ln p = Σ_{seen} ln(cnt+1) − m·ln(tot_L + V), with
    * m = the doc's in-vocab occurrence count — the score needs only the
    * SPARSE (lang, gram) count rows plus one constant per language, and
    * the (doc × lang) grid completes by exploding a literal language
    * array (collected once; driver state = #languages strings, the
    * centroid-collect argument), never a BNLJ cross join.
    *
    * SCALE: the n-gram space is bounded by charset^n, not the corpus;
    * the vocab cut is orderBy+limit = TakeOrderedAndProject; every model
    * join is a bounded broadcast (≤ vocabSize rows). The corpus side is
    * two explode passes (the q83 trade — m and the per-lang sum each
    * re-derive from the scan rather than checkpointing corpus-scale
    * exploded rows), both feeding map-side-combining aggregations; the
    * argmax is a doc-partitioned rank window Spark prunes with
    * WindowGroupLimit. */
  def trainedLangId(docs: DataFrame, labeled: DataFrame, n: Int = 3,
      vocabSize: Int = 2000, idCol: String = "doc_id",
      textCol: String = "text", langCol: String = "lang"): DataFrame = {
    // guard: sequence(1, k) counts DOWN for k < 1 — empty short docs out
    def grams(c: org.apache.spark.sql.Column) =
      when(length(c) >= n,
        transform(sequence(lit(1), length(c) - (n - 1)), i => c.substr(i, lit(n))))
        .otherwise(expr("cast(array() as array<string>)"))
    // scale-adaptive fan-out before the ~len(text)-way char-gram explode:
    // a tiny/few-file doc table plans fewer scan splits than the session
    // has cores (a 0.6 MB single-row-group parquet is ONE split however
    // configs slice it), leaving the explode+partial-agg stage — the
    // query's dominant work — on one core. Redistribute ONLY then; any
    // real corpus already carries splits >= parallelism and pays nothing
    // (measured at sf0.1: 5.3 -> 2.4 s; results unchanged — the explode
    // feeds integer count aggregates, and the one float sum downstream
    // already carries the 4 dp rounding convention).
    def fanned(df: DataFrame): DataFrame = {
      val p = df.sparkSession.sparkContext.defaultParallelism
      if (df.rdd.getNumPartitions < p) df.repartition(p) else df
    }
    val counts = fanned(labeled)
      .select(col(langCol).as("lang"), explode(grams(col(textCol))).as("g"))
      .groupBy("lang", "g").agg(count(lit(1)).as("cnt"))
      .localCheckpoint(eager = false) // vocab + scoring both derive from it
    val vocab = counts.groupBy("g").agg(sum("cnt").as("tot"))
      .orderBy(col("tot").desc, col("g")).limit(vocabSize)
      .select("g")
      .localCheckpoint(eager = false) // referenced by model AND both doc passes
    val countsV = counts.join(broadcast(vocab), Seq("g"))
      .localCheckpoint(eager = false)
    val perLang = countsV.groupBy("lang").agg(sum("cnt").as("tot_l"))
      .crossJoin(broadcast(vocab.agg(count(lit(1)).as("v")))) // single-row
    val langs = countsV.select("lang").distinct().orderBy("lang")
      .collect().map(_.getString(0)) // bounded: one string per language
    // ONE corpus explode: in-vocab occurrences aggregate to per-(doc,
    // gram) multiplicities first, and BOTH the m-count and the scoring
    // sum derive from that table (a `def` here re-ran the explode and
    // the vocab join per consumer — measured 2x the whole query).
    // Σ_occurrences log(cnt+1) == Σ_grams k·log(cnt+1) exactly as math;
    // the float fold order changes, absorbed by the 4 dp rounding the
    // score already carries.
    val og = fanned(docs).select(col(idCol).as("doc_id"),
        explode(grams(col(textCol))).as("g"))
      .join(broadcast(vocab), Seq("g"))
      .groupBy("doc_id", "g").agg(count(lit(1)).as("k"))
      .localCheckpoint(eager = false) // feeds m AND the per-lang scores
    val m = og.groupBy("doc_id").agg(sum(col("k")).as("m"))
    val a = og.join(broadcast(countsV), Seq("g"))
      .groupBy("doc_id", "lang")
      .agg(sum(col("k").cast("double") *
        log(col("cnt").cast("double") + 1.0)).as("a"))
    val rnk = Window.partitionBy("doc_id")
      .orderBy(col("score").desc, col("lang"))
    m.select(col("doc_id"), col("m"),
        explode(array(langs.map(lit): _*)).as("lang"))
      .join(a, Seq("doc_id", "lang"), "left")
      .join(broadcast(perLang), Seq("lang"))
      .select(col("doc_id"), col("lang"),
        round(coalesce(col("a"), lit(0.0)) - col("m").cast("double") *
          log(col("tot_l").cast("double") + col("v").cast("double")), 4)
          .as("score"))
      .withColumn("rn", row_number().over(rnk))
      .where(col("rn") === 1)
      .select(col("doc_id"), col("lang").as("lang_pred"), col("score"))
  }

  /** Per-GROUP simple OLS — [[zipfFit]]'s regression fold generalized
    * to grouped data: within every group fit y = a + b·x by the closed-
    * form normal equations and report slope, intercept, and R². One
    * map-side-combined aggregation per group (the five sufficient
    * sums), the fit composed at the group-sized output; display
    * rounding absorbs cross-engine sum-order ulps. Degenerate groups
    * (n < 2 or zero x-variance) report null slope/intercept/r2. */
  def groupedOls(df: DataFrame, gCol: String, xCol: org.apache.spark.sql.Column,
      yCol: org.apache.spark.sql.Column): DataFrame = {
    val agg = df.select(col(gCol), xCol.cast("double").as("x"),
        yCol.cast("double").as("y"))
      .groupBy(gCol)
      .agg(count(lit(1)).cast("double").as("n"), sum("x").as("sx"),
        sum("y").as("sy"), sum(col("x") * col("x")).as("sxx"),
        sum(col("y") * col("y")).as("syy"),
        sum(col("x") * col("y")).as("sxy"))
    val vx = agg("n") * col("sxx") - col("sx") * col("sx")
    val vy = agg("n") * col("syy") - col("sy") * col("sy")
    val cxy = agg("n") * col("sxy") - col("sx") * col("sy")
    val slope = cxy / vx
    agg.select(col(gCol), col("n").cast("long").as("n"),
      when(col("n") >= 2 && vx > 0,
        round(slope * 10000.0) / 10000.0).as("slope"),
      when(col("n") >= 2 && vx > 0,
        round((col("sy") - slope * col("sx")) / col("n") * 10000.0)
          / 10000.0).as("intercept"),
      when(col("n") >= 2 && vx > 0 && vy > 0,
        round(cxy * cxy / (vx * vy) * 10000.0) / 10000.0).as("r2"))
  }

  /** Zipf's-law fit over the corpus unigram distribution: OLS of
    * ln(freq) on ln(rank) across the top-`k` terms — slope ≈ −1 is the
    * healthy-natural-text signature; a flattened slope flags template/
    * boilerplate takeover and a steepened one vocabulary collapse. The
    * cheap corpus-health scalar to trend per ingest batch (q123's KL
    * drift localizes WHICH source moved; this says whether the corpus
    * still looks like language).
    *
    * SCALE: one tokenize into a vocab-sized (term, count) aggregate,
    * cut to k rows by TakeOrderedAndProject (map-side top-k, no global
    * sort); the rank window and the OLS fold run on those k rows only.
    * Output is a single row. */
  def zipfFit(docs: DataFrame, k: Int = 100,
      textCol: String = "text"): DataFrame = {
    val top = docs
      .select(explode(TextAnalysis.tokens(col(textCol))).as("term"))
      .groupBy("term").agg(count(lit(1)).as("cnt"))
      .orderBy(col("cnt").desc, col("term")).limit(k)
    // domain-bounded window: LIMIT-k relation (TakeOrderedAndProject upstream)
    val w = Window.orderBy(col("cnt").desc, col("term"))
    top.withColumn("r", row_number().over(w))
      .select(log(col("r").cast("double")).as("x"),
        log(col("cnt").cast("double")).as("y"))
      .agg(count(lit(1)).cast("double").as("n"), sum("x").as("sx"),
        sum("y").as("sy"), sum(col("x") * col("x")).as("sxx"),
        sum(col("x") * col("y")).as("sxy"))
      .select(col("n").cast("long").as("n_terms"),
        (round((col("n") * col("sxy") - col("sx") * col("sy")) /
          (col("n") * col("sxx") - col("sx") * col("sx")) * 10000.0)
          / 10000.0).as("slope"),
        (round((col("sy") - (col("n") * col("sxy") - col("sx") * col("sy")) /
          (col("n") * col("sxx") - col("sx") * col("sx")) * col("sx")) /
          col("n") * 10000.0) / 10000.0).as("intercept"))
  }

  /** Sequence-length bucketing analysis: assign every document to the
    * smallest cap in the fixed `caps` menu that fits its token count
    * (overflow docs land in the last cap), and report per bucket how
    * much a pad-to-cap batcher wastes — the planning pass behind
    * length-grouped batching (bucketed batches cut padding FLOPs vs
    * one global max-length pad; this quantifies by how much, per
    * bucket, before committing to a bucket menu). The cap menu is a
    * CASE chain of literals, not log2 float math, so bucket edges are
    * exact and engine-portable.
    *
    * SCALE: one codegen'd projection (token count + cap CASE) feeding
    * one map-side-combinable aggregation keyed on the menu-sized cap —
    * scan-speed, output is |caps| rows. */
  def lengthBucketWaste(docs: DataFrame, caps: Seq[Int],
      textCol: String = "text"): DataFrame = {
    require(caps.nonEmpty && caps == caps.sorted, "caps must be ascending")
    val n = TextAnalysis.tokenCount(col(textCol))
    val cap = caps.init.foldRight(lit(caps.last.toLong): org.apache.spark.sql.Column)(
      (c, rest) => when(n <= c, c.toLong).otherwise(rest))
    docs.select(cap.as("bucket_cap"), n.as("n"))
      .groupBy("bucket_cap")
      .agg(count(lit(1)).as("n_docs"), sum("n").as("sum_tokens"))
      .select(col("bucket_cap"), col("n_docs"), col("sum_tokens"),
        (col("bucket_cap") * col("n_docs")).as("padded_tokens"),
        (round((lit(1.0) - col("sum_tokens").cast("double") /
          (col("bucket_cap") * col("n_docs")).cast("double")) * 1000000.0)
          / 1000000.0).as("waste_frac"))
  }

  /** Retrieval evaluation — NDCG@`atK` and MRR for a [[bm25]] ranking
    * against a graded term-overlap relevance proxy (rel = number of
    * DISTINCT query terms the document contains): the ranking-quality
    * scalars that PR/AUC (classification) don't measure. DCG uses the
    * standard (2^rel − 1)/log₂(rank+1) gains; the ideal ordering sorts
    * the CORPUS by rel (not just the retrieved list), so a ranker that
    * misses relevant docs is penalized.
    *
    * Determinism: rels and ranks are exact integers; each gain term is
    * one fixed IEEE chain (log₂ via ln/ln — same shape both engines);
    * the ≤k-term DCG sums are display-rounded 6 dp.
    *
    * SCALE: the ranking is list-sized by the bm25 contract; the rel
    * proxy is one scan-speed projection; IDCG needs only the top-`atK`
    * rel values (TakeOrderedAndProject). Output: 1 row. */
  def retrievalEval(docs: DataFrame, queryTerms: Seq[String], atK: Int = 10,
      idCol: String = "doc_id", textCol: String = "text"): DataFrame = {
    val toks = TextAnalysis.tokens(col(textCol))
    val rel = docs.select(col(idCol).as("id"),
      size(array_intersect(array_distinct(toks),
        array(queryTerms.map(lit): _*))).cast("long").as("rel"))
    val ranked = bm25(docs, queryTerms, topK = atK, idCol = idCol,
        textCol = textCol)
      .withColumn("rank", row_number().over(
        // domain-bounded window: bm25's list-sized top-k output
        Window.orderBy(col("score").desc, col(idCol))).cast("long"))
      .select(col(idCol).as("id"), col("rank"))
    val logTwo = math.log(2.0)
    def gain(relC: org.apache.spark.sql.Column,
        rankC: org.apache.spark.sql.Column) =
      (pow(lit(2.0), relC.cast("double")) - lit(1.0)) /
        (log(rankC.cast("double") + lit(1.0)) / lit(logTwo))
    val dcg = ranked.join(rel, Seq("id"))
      .agg(sum(gain(col("rel"), col("rank"))).as("dcg"))
    val ideal = rel.orderBy(col("rel").desc, col("id")).limit(atK)
      .withColumn("rank", row_number().over(
        // domain-bounded window: LIMIT-atK relation
        Window.orderBy(col("rel").desc, col("id"))).cast("long"))
      .agg(sum(gain(col("rel"), col("rank"))).as("idcg"))
    val mrr = ranked.join(rel, Seq("id"))
      .where(col("rel") > 0)
      .agg(min(col("rank")).as("first_rel"))
    dcg.join(broadcast(ideal)).join(broadcast(mrr))
      .select(
        (round(col("dcg") / col("idcg") * 1000000.0) / 1000000.0)
          .as("ndcg_at_k"),
        (round(lit(1.0) / col("first_rel").cast("double") * 1000000.0)
          / 1000000.0).as("mrr"),
        col("first_rel"))
  }

  /** Top-k tf-idf cosine document pairs: sparse dot products over the
    * shared-term join, normalized by per-doc vector norms — the
    * lexical near-duplicate/relatedness rank that complements the
    * shingle (surface) and embedding (semantic) pair finders. The
    * vector space keeps terms with 2 ≤ df ≤ `maxDf`: df-1 terms join
    * no pairs, and stopword-frequency terms would make every pair a
    * candidate (the PPJoin prefix argument in its crudest form).
    *
    * SCALE: the pair join is term-keyed and df-bounded (each term
    * contributes ≤ maxDf² pairs); norms are doc-keyed one-pass sums;
    * top-k cuts with TakeOrderedAndProject on the ROUNDED cosine. */
  def tfidfCosinePairs(docs: DataFrame, topK: Int = 20, maxDf: Int = 100,
      idCol: String = "doc_id", textCol: String = "text"): DataFrame = {
    val tf = docs.select(col(idCol).as("id"),
        explode(TextAnalysis.tokens(col(textCol))).as("term"))
      .groupBy("id", "term").agg(count(lit(1)).as("tf"))
    val nd = docs.agg(count(lit(1)).as("nd"))
    val dfT = tf.groupBy("term").agg(count(lit(1)).as("df"))
      .where(col("df") >= 2 && col("df") <= maxDf)
    val wts = tf.join(dfT, "term").join(broadcast(nd))
      .select(col("id"), col("term"),
        (col("tf").cast("double") *
          log(col("nd").cast("double") / col("df").cast("double"))).as("w"))
      .localCheckpoint() // feeds norms + both pair-join sides
    val norms = wts.groupBy("id").agg(sum(col("w") * col("w")).as("n2"))
    val dots = wts.select(col("id").as("ia"), col("term"), col("w").as("wa"))
      .join(wts.select(col("id").as("ib"), col("term"), col("w").as("wb")),
        Seq("term"))
      .where(col("ia") < col("ib"))
      .groupBy("ia", "ib").agg(sum(col("wa") * col("wb")).as("dot"))
    dots
      .join(norms.select(col("id").as("ia"), col("n2").as("na")), "ia")
      .join(norms.select(col("id").as("ib"), col("n2").as("nb")), "ib")
      .select(col("ia").as("id_a"), col("ib").as("id_b"),
        (round(col("dot") / (sqrt(col("na")) * sqrt(col("nb"))) * 10000.0)
          / 10000.0).as("cos"))
      .orderBy(col("cos").desc, col("id_a"), col("id_b")).limit(topK)
  }

  /** Pairwise vocabulary Jaccard between sources: distinct-term set
    * overlap |A∩B|/|A∪B| per source pair — the set-membership
    * complement to [[jsDivergenceMatrix]]'s distributional distance
    * (two sources can share every word yet weight them differently;
    * this catches disjoint jargon, that catches reweighting). Pairs
    * with zero shared terms are absent (no row, by the inner join).
    *
    * SCALE: distinct (source, term) is vocab×sources-sized; the
    * intersection join is term-keyed; sizes re-enter source-domain-
    * sized. All exact integers + one division. */
  def vocabJaccard(docs: DataFrame, srcCol: String = "source",
      textCol: String = "text"): DataFrame = {
    val vt = docs.select(col(srcCol).as("src"),
        explode(TextAnalysis.tokens(col(textCol))).as("term"))
      .where(length(col("term")) > 0).distinct()
    val sz = vt.groupBy("src").agg(count(lit(1)).as("n"))
    val inter = vt.select(col("src").as("sa"), col("term"))
      .join(vt.select(col("src").as("sb"), col("term")), Seq("term"))
      .where(col("sa") < col("sb"))
      .groupBy("sa", "sb").agg(count(lit(1)).as("i"))
    inter
      .join(broadcast(sz.select(col("src").as("sa"), col("n").as("na"))), "sa")
      .join(broadcast(sz.select(col("src").as("sb"), col("n").as("nb"))), "sb")
      .select(col("sa").as("src_a"), col("sb").as("src_b"),
        col("i").as("common"), col("na").as("n_a"), col("nb").as("n_b"),
        (round(col("i").cast("double") /
          (col("na") + col("nb") - col("i")).cast("double") * 1000000.0)
          / 1000000.0).as("jaccard"))
      .orderBy("src_a", "src_b")
  }

  /** Cross-language perplexity matrix: every language's documents
    * scored under every language's add-one-smoothed unigram LM —
    * bits/token per (doc_lang, model_lang) cell. The diagonal should
    * be the minimum of each row; an off-diagonal dip flags mislabeled
    * slices. The DSIR-style "how target-like is this slice" view
    * generalized to all pairs.
    *
    * p(w|L) = (c_{w,L} + 1) / (n_L + V), V the shared vocab size —
    * smoothing keeps unseen tokens finite so every (doc, model) pair
    * scores.
    *
    * SCALE: the model tables are (lang × vocab)-sized; the scoring
    * pass crosses each token row with the LANG list (domain-sized
    * broadcast — the documented bounded-multiplier class) and left-
    * joins the model on (lang, term). One corpus explode ×|langs|. */
  def crossPerplexity(docs: DataFrame, langCol: String = "lang",
      textCol: String = "text"): DataFrame = {
    val toks = docs.select(col(langCol).as("dl"),
      explode(TextAnalysis.tokens(col(textCol))).as("term"))
    val counts = toks.groupBy("dl", "term").agg(count(lit(1)).as("c"))
    val nl = counts.groupBy("dl").agg(sum(col("c")).as("n"))
    val vocab = toks.select("term").distinct().agg(count(lit(1)).as("v"))
    val models = counts.select(col("dl").as("ml"), col("term"), col("c"))
    val langs = nl.select(col("dl").as("ml"), col("n"))
    val logTwo = math.log(2.0)
    val p = (coalesce(col("c"), lit(0L)).cast("double") + lit(1.0)) /
      (col("n").cast("double") + col("v").cast("double"))
    toks.crossJoin(broadcast(langs))
      .join(models, Seq("ml", "term"), "left")
      .join(broadcast(vocab))
      .groupBy(col("dl").as("doc_lang"), col("ml").as("model_lang"))
      .agg(count(lit(1)).as("n_tok"),
        round(avg(-log(p) / logTwo), 4).as("bits_per_tok"))
      .orderBy("doc_lang", "model_lang")
  }

  /** Per-source signature terms: for every source, the top-`perSource`
    * terms by source-frequency × ln(S/df_sources) — tf-idf computed at
    * SOURCE granularity, so a term scores high when one source uses it
    * heavily and few other sources use it at all. The qualitative
    * companion to [[jsDivergenceMatrix]]: the matrix says sources
    * differ, this names the words that make them differ.
    *
    * Determinism: tf and the source-document-frequency are exact
    * integers; the score is one multiply of an exact int against one
    * ln of an exact ratio, ranked on the ROUNDED value with a term
    * tiebreak.
    *
    * SCALE: one tokenize into a (source × vocab)-sized aggregate; df
    * aggregates from that same table; the per-source top-k is a
    * source-partitioned window over the vocab slice. */
  def sourceSignatures(docs: DataFrame, perSource: Int = 5,
      srcCol: String = "source", textCol: String = "text"): DataFrame = {
    val tf = docs.select(col(srcCol).as("src"),
        explode(TextAnalysis.tokens(col(textCol))).as("term"))
      .groupBy("src", "term").agg(count(lit(1)).as("tf"))
    val df = tf.groupBy("term").agg(count(lit(1)).as("df"))
    val nSrc = tf.select("src").distinct().agg(count(lit(1)).as("s"))
    val score = round(col("tf").cast("double") *
      log(col("s").cast("double") / col("df").cast("double")) * 10000.0) /
      10000.0
    val byScore = Window.partitionBy("src")
      .orderBy(col("score").desc, col("term"))
    tf.join(df, "term").join(broadcast(nSrc))
      .withColumn("score", score)
      .withColumn("rnk", row_number().over(byScore).cast("long"))
      .where(col("rnk") <= perSource)
      .select(col("src").as("source"), col("rnk"), col("term"),
        col("tf"), col("df").as("df_sources"), col("score"))
      .orderBy("source", "rnk")
  }

  /** Pairwise Jensen–Shannon divergence between per-source token
    * distributions over the shared top-`vocabK` corpus vocabulary —
    * the symmetric, bounded [0, ln 2] drift matrix that says WHICH
    * sources differ (q123's KL drift is one-vs-rest; this is
    * all-pairs). Distributions are restricted to the fixed head vocab
    * so the grid is (sources × vocabK)-bounded regardless of corpus
    * size.
    *
    * Determinism: counts exact; each pair's JS sums 2·vocabK ln terms
    * (display-rounded 4 dp — the ln-fold precedent); zero-count terms
    * contribute 0 by the 0·ln 0 convention.
    *
    * SCALE: one tokenize to the vocab cut (TakeOrderedAndProject), one
    * source×vocab dense grid (broadcast-built), a pair join keyed on
    * term — everything after the scan is grid-sized. */
  def jsDivergenceMatrix(docs: DataFrame, vocabK: Int = 50,
      srcCol: String = "source", textCol: String = "text"): DataFrame = {
    val toks = docs.select(col(srcCol).as("src"),
      explode(TextAnalysis.tokens(col(textCol))).as("term"))
    val vocab = toks.groupBy("term").agg(count(lit(1)).as("cnt"))
      .orderBy(col("cnt").desc, col("term")).limit(vocabK)
      .select("term")
    val counts = toks.join(broadcast(vocab), Seq("term"))
      .groupBy("src", "term").agg(count(lit(1)).as("c"))
    val srcs = counts.select("src").distinct()
    val dense = srcs.crossJoin(broadcast(vocab))
      .join(counts, Seq("src", "term"), "left")
      .select(col("src"), col("term"), coalesce(col("c"), lit(0L)).as("c"))
    val totals = dense.groupBy("src").agg(sum(col("c")).as("n"))
    val withP = dense.join(broadcast(totals), "src")
      .select(col("src"), col("term"),
        (col("c").cast("double") / col("n").cast("double")).as("p"))
    val pairs = withP.select(col("src").as("src_a"), col("term"),
        col("p").as("pa"))
      .join(withP.select(col("src").as("src_b"), col("term"),
        col("p").as("pb")), Seq("term"))
      .where(col("src_a") < col("src_b"))
    val m = (col("pa") + col("pb")) / lit(2.0)
    val term = when(col("pa") > 0, lit(0.5) * col("pa") * log(col("pa") / m))
      .otherwise(lit(0.0)) +
      when(col("pb") > 0, lit(0.5) * col("pb") * log(col("pb") / m))
        .otherwise(lit(0.0))
    pairs.groupBy("src_a", "src_b")
      .agg((round(sum(term) * 10000.0) / 10000.0).as("js"))
      .orderBy("src_a", "src_b")
  }

  /** Query-likelihood retrieval with Dirichlet smoothing (Zhai &
    * Lafferty, SIGIR '01) — the language-modeling alternative to
    * [[bm25]]: score(d) = Σ_{w∈q} ln p(w|d) with
    * p(w|d) = (tf + μ·p(w|C)) / (dl + μ), decomposed into the present-
    * term sum Σ ln(1 + tf/(μ·p(w|C))) plus the length normalizer
    * |q|·ln(μ/(dl+μ)) so EVERY document scores (absent terms ride the
    * background model) without materializing absent (doc, term) pairs.
    *
    * SCALE: same shape as bm25 — term-filtered tf explode (the filter
    * sits on the scan), query-term-sized collection stats broadcast,
    * one left join of the doc-length table against the per-doc present-
    * term sums, TakeOrderedAndProject cut. */
  def qlDirichlet(docs: DataFrame, queryTerms: Seq[String], topK: Int,
      mu: Double = 2000.0, idCol: String = "doc_id",
      textCol: String = "text"): DataFrame = {
    val toks = docs.select(col(idCol), TextAnalysis.tokens(col(textCol)).as("w"))
    val dl = toks.select(col(idCol), size(col("w")).cast("double").as("dl"))
    val tot = toks.agg(sum(size(col("w"))).cast("double").as("total"))
    val terms = toks.select(col(idCol), explode(col("w")).as("term"))
      .where(col("term").isin(queryTerms: _*))
    val cf = terms.groupBy("term").agg(count(lit(1)).cast("double").as("cf"))
    val tf = terms.groupBy(col(idCol), col("term"))
      .agg(count(lit(1)).cast("double").as("tf"))
    val present = tf.join(broadcast(cf), Seq("term")).join(broadcast(tot))
      .withColumn("contrib",
        log(lit(1.0) + col("tf") / (lit(mu) * (col("cf") / col("total")))))
      .groupBy(col(idCol)).agg(sum(col("contrib")).as("s"))
    dl.join(present, Seq(idCol), "left")
      .select(col(idCol),
        round(coalesce(col("s"), lit(0.0)) +
          lit(queryTerms.size.toDouble) * log(lit(mu) / (col("dl") + lit(mu))),
          4).as("score"))
      .orderBy(col("score").desc, col(idCol))
      .limit(topK)
  }

  /** RAKE keyphrase extraction (Rose et al. 2010): candidate phrases
    * are maximal stopword-free token runs; each word scores
    * degree/frequency (degree = Σ phrase length over its occurrences),
    * a phrase scores the sum of its words — the zero-training
    * keyphrase ranker that beats pure frequency on multi-word terms.
    *
    * Determinism: frequencies and degrees are exact integer counts;
    * the per-phrase score sums a handful of exact-ratio doubles
    * (display-rounded to 4 dp, which absorbs sub-ulp aggregation-order
    * drift); ordering uses the ROUNDED score with a phrase tiebreak.
    *
    * SCALE: phrase segmentation is pure per-row array work
    * (scan-speed); word stats and candidates are vocab-/phrase-
    * vocabulary-sized map-side aggregates; top-k cuts with
    * TakeOrderedAndProject. */
  def rakeKeyphrases(docs: DataFrame, stopwords: Seq[String],
      topK: Int = 20, maxPhraseLen: Int = 4,
      textCol: String = "text"): DataFrame = {
    val stops = array(stopwords.map(lit): _*)
    val toks = TextAnalysis.tokens(col(textCol))
    val marked = transform(toks, t =>
      when(array_contains(stops, t) || length(t) === 0, lit("\u0001"))
        .otherwise(t))
    val segs = split(array_join(marked, " "), "\u0001")
    val phrases = filter(transform(segs, p => trim(p)), p => length(p) > 0)
    val ph = docs.select(explode(phrases).as("phrase"))
      .where(size(split(col("phrase"), " ")) <= maxPhraseLen)
    val words = ph.select(col("phrase"),
      size(split(col("phrase"), " ")).cast("long").as("plen"),
      explode(split(col("phrase"), " ")).as("w"))
    val stats = words.groupBy("w")
      .agg(count(lit(1)).as("freq"), sum(col("plen")).as("degree"))
    val cand = ph.groupBy("phrase").agg(count(lit(1)).as("n_occ"))
    cand.select(col("phrase"), explode(split(col("phrase"), " ")).as("w"))
      .join(stats, "w")
      .groupBy("phrase")
      .agg((round(sum(col("degree").cast("double") /
        col("freq").cast("double")) * 10000.0) / 10000.0).as("score"))
      .join(cand, "phrase")
      .select(col("phrase"), col("n_occ"), col("score"))
      .orderBy(col("score").desc, col("phrase")).limit(topK)
  }

  /** Dunning log-likelihood-ratio collocations (Dunning, CL 19(1)
    * 1993): rank adjacent word pairs by the G² statistic of the 2×2
    * bigram contingency — the collocation test that, unlike PMI
    * ([[pmiPairs]]), does not explode on rare pairs, because xlogx
    * weights cells by their mass.
    *
    * Cells: k11 = c(w1w2); k12 = c(w1·) − k11; k21 = c(·w2) − k11;
    * k22 = N − c(w1·) − c(·w2) + k11, over the N corpus bigram slots.
    * G² = 2·[Σ xlx(k) + xlx(N) − xlx(rows) − xlx(cols)] with
    * xlx(c) = c·ln c (0 at 0). All cells are exact integer counts; ln
    * is the one libm call, absorbed by 4 dp display rounding, and the
    * top-k orders on the ROUNDED statistic with a (w1, w2) tiebreak so
    * a last-ulp libm difference can't reorder engines.
    *
    * SCALE: bigrams via arrays_zip of token-array slices (no
    * self-join); three vocab-sized aggregates + a single-row total,
    * joined pair-table-sized; top-k via TakeOrderedAndProject. */
  def llrCollocations(docs: DataFrame, topK: Int = 30, minCount: Long = 5L,
      textCol: String = "text"): DataFrame = {
    val toks = TextAnalysis.tokens(col(textCol))
    val pairs = docs.select(
      explode(arrays_zip(slice(toks, lit(1), size(toks) - 1),
        slice(toks, lit(2), size(toks) - 1))).as("bg"))
      .select(col("bg.0").as("w1"), col("bg.1").as("w2"))
    val bg = pairs.groupBy("w1", "w2").agg(count(lit(1)).as("k11"))
    val lft = pairs.groupBy("w1").agg(count(lit(1)).as("c1"))
    val rgt = pairs.groupBy("w2").agg(count(lit(1)).as("c2"))
    val tot = pairs.agg(count(lit(1)).as("nn"))
    def xlx(c: org.apache.spark.sql.Column) = when(c > 0,
      c.cast("double") * log(c.cast("double"))).otherwise(lit(0.0))
    val (k11, c1, c2, nn) = (col("k11"), col("c1"), col("c2"), col("nn"))
    val k12 = c1 - k11
    val k21 = c2 - k11
    val k22 = nn - c1 - c2 + k11
    val llr = lit(2.0) * (xlx(k11) + xlx(k12) + xlx(k21) + xlx(k22) +
      xlx(nn) - xlx(c1) - xlx(nn - c1) - xlx(c2) - xlx(nn - c2))
    bg.where(col("k11") >= minCount)
      .join(lft, "w1").join(rgt, "w2").join(broadcast(tot))
      .select(col("w1"), col("w2"), col("k11").as("n_pair"),
        (round(llr * 10000.0) / 10000.0).as("llr"))
      .orderBy(col("llr").desc, col("w1"), col("w2")).limit(topK)
  }

  /** χ² token–label feature selection: for every token, the 2×2
    * contingency of document-frequency against a boolean label, scored
    * by Pearson's chi-squared — the classic pre-training step that
    * surfaces the vocabulary most associated with a quality/domain
    * label before training a classifier on it (Yang & Pedersen,
    * ICML '97 survey ranks χ² top among selection criteria).
    *
    * Determinism: the contingency cells (a = docs with token & label,
    * b = token & ¬label, c/d = complements) are exact integer counts;
    * a·d − b·c is computed in decimal(38,0) so the cross term never
    * wraps a long (each factor is ≤ N, the corpus doc count — the
    * product is ~N², past Long.MaxValue for N ≥ ~3·10⁹ docs). The
    * square and the marginal product happen in double on BOTH engines
    * in the same expression shape, then display-rounded — identical
    * bits either side.
    *
    * SCALE: one corpus pass exploding DISTINCT tokens per doc into a
    * vocab-sized (token, a, b) aggregate (map-side combined); the label
    * totals join back as a single-row broadcast. Top-k cuts with
    * TakeOrderedAndProject — no global sort. */
  def chiSquaredTokens(docs: DataFrame, label: org.apache.spark.sql.Column,
      topK: Int = 30, textCol: String = "text"): DataFrame = {
    val lab = docs.select(label.cast("long").as("y"), col(textCol))
    val pairs = lab.select(col("y"), explode(array_distinct(
        filter(TextAnalysis.tokens(col(textCol)), t => length(t) > 0)))
      .as("token"))
    val tok = pairs.groupBy("token")
      .agg(sum(col("y")).as("a"), sum(lit(1L) - col("y")).as("b"))
    val tot = lab.agg(sum(col("y")).as("n1"),
      sum(lit(1L) - col("y")).as("n0"))
    val dec = org.apache.spark.sql.types.DecimalType(38, 0)
    val (aD, bD) = (col("a").cast(dec), col("b").cast(dec))
    val cD = (col("n1") - col("a")).cast(dec)
    val dD = (col("n0") - col("b")).cast(dec)
    val delta = (aD * dD - bD * cD).cast("double")
    val den = (aD + bD).cast("double") * (cD + dD).cast("double") *
      (aD + cD).cast("double") * (bD + dD).cast("double")
    val chi2 = (col("n1") + col("n0")).cast("double") * delta * delta / den
    tok.join(broadcast(tot))
      .where(col("a") + col("b") < col("n1") + col("n0"))
      .select(col("token"), col("a").cast("long").as("df_pos"),
        col("b").cast("long").as("df_neg"),
        (round(chi2 * 10000.0) / 10000.0).as("chi2"))
      .orderBy(col("chi2").desc, col("token")).limit(topK)
  }

  /** Count-based word embeddings (Levy & Goldberg 2014): PPMI matrix of
    * the ±2 skip-gram window over the top-`vocabSize` terms, then the
    * top-2 spectral coordinates by quantized power iteration with
    * deflation — SGNS-class embeddings with NO stochastic training.
    * Determinism stack: PPMI cells quantize to 1e-6 after the single
    * ln (q378 convention); each iteration round renormalizes and
    * quantizes the vector to 1e-9 (q240 discipline — vocab-sized sums
    * drift ~1e-15, five orders under the quantum); the second component
    * deflates against the FINAL first component each round, so the
    * whole computation is a fixed replayable arithmetic chain whether
    * or not the spectrum has converged.
    *
    * SCALE: corpus work is one scan-speed offset explode (pair mass
    * exactly ≤ 4·corpus tokens, no self-join); the V×V matrix collects
    * at model size and the iteration is driver-side; output is V
    * rows. */
  def ppmiSpectralEmbeddings(docs: DataFrame, vocabSize: Int = 30,
      rounds: Int = 8, textCol: String = "text"): DataFrame = {
    val spark = docs.sparkSession
    import spark.implicits._
    val tk = docs.select(col("doc_id"),
      posexplode(TextAnalysis.tokens(col(textCol))).as(Seq("pos", "w")))
    val vocabRows = tk.groupBy("w").agg(count(lit(1)).as("cnt"))
      .orderBy(col("cnt").desc, col("w")).limit(vocabSize)
      .collect().map(_.getString(0))
    val idx = vocabRows.zipWithIndex.toMap
    val vlit = array(vocabRows.map(lit(_)): _*)
    // ±2 window via literal offsets over the token array — scan-speed
    // (pair mass exactly ≤ 4·tokens), the q278 pp construction; never
    // a per-doc position self-join
    val pairs = docs
      .select(TextAnalysis.tokens(col(textCol)).as("t"))
      .select(col("t"), posexplode(col("t")).as(Seq("pos", "w")))
      .select(col("w"), col("t"), col("pos"),
        explode(array(lit(-2), lit(-1), lit(1), lit(2))).as("off"))
      .where(col("pos") + col("off") >= 0 &&
        col("pos") + col("off") < size(col("t")))
      .select(col("w"),
        element_at(col("t"), col("pos") + col("off") + 1).as("c"))
      .where(array_contains(vlit, col("w")) &&
        array_contains(vlit, col("c")))
      .groupBy("w", "c").agg(count(lit(1)).as("n"))
      .collect().map(r => (r.getString(0), r.getString(1), r.getLong(2)))
    val v = vocabRows.length
    val cnt = Array.ofDim[Long](v, v)
    pairs.foreach { case (a, b, n) => cnt(idx(a))(idx(b)) = n }
    val nTot = pairs.map(_._3).sum
    val rowSum = cnt.map(_.sum)
    def q6(x: Double) = math.round(x * 1e6) / 1e6
    def q9(x: Double) = math.round(x * 1e9) / 1e9
    val m = Array.tabulate(v, v) { (i, j) =>
      if (cnt(i)(j) > 0 && rowSum(i) > 0 && rowSum(j) > 0) {
        val pmi = q6(math.log(cnt(i)(j).toDouble * nTot /
          (rowSum(i).toDouble * rowSum(j).toDouble)))
        if (pmi > 0) pmi else 0.0
      } else 0.0
    }
    def matvec(x: Array[Double]): Array[Double] =
      Array.tabulate(v) { i =>
        var s = 0.0; var j = 0
        while (j < v) { s += m(i)(j) * x(j); j += 1 }
        s
      }
    def normq(y: Array[Double]): Array[Double] = {
      var s = 0.0; var i = 0
      while (i < v) { s += y(i) * y(i); i += 1 }
      val nrm = math.sqrt(s)
      y.map(e => q9(e / nrm))
    }
    var x1 = Array.fill(v)(q9(1.0 / math.sqrt(v.toDouble)))
    for (_ <- 1 to rounds) x1 = normq(matvec(x1))
    var x2 = Array.tabulate(v)(i =>
      q9((if (i % 2 == 0) 1.0 else -1.0) / math.sqrt(v.toDouble)))
    for (_ <- 1 to rounds) {
      val y = matvec(x2)
      var p = 0.0
      var i = 0
      while (i < v) { p += x1(i) * y(i); i += 1 }
      x2 = normq(Array.tabulate(v)(i => y(i) - p * x1(i)))
    }
    def rayleigh(x: Array[Double]): Double = {
      val y = matvec(x)
      var num = 0.0; var den = 0.0; var i = 0
      while (i < v) { num += x(i) * y(i); den += x(i) * x(i); i += 1 }
      num / den
    }
    val (l1, l2) = (rayleigh(x1), rayleigh(x2))
    vocabRows.zipWithIndex.map { case (w, i) =>
      (i.toLong, w, q6(x1(i)), q6(x2(i)),
        math.round(l1 * 1e6) / 1e6.toDouble,
        math.round(l2 * 1e6) / 1e6.toDouble)
    }.toSeq.toDF("idx", "term", "e1", "e2", "lambda1", "lambda2")
      .orderBy("idx")
  }
}
