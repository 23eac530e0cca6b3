package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Deduplication operators for LLM training-data pipelines: exact,
  * shingle-Jaccard (exact near-dup), MinHash-LSH (approximate near-dup at
  * scale), and SimHash (hamming-distance near-dup).
  *
  * SCALE design:
  *  - exact: one hash-partitioned groupBy on the text (or fingerprint) key —
  *    the canonical map-side-combinable shuffle; at 100 TB group on
  *    md5(text) (16 bytes) rather than the text itself to shrink shuffle IO.
  *  - shingleJaccardPairs: inverted-index join on shared shingles. Exact but
  *    quadratic in the worst case — use it on candidate sets, not the raw
  *    corpus.
  *  - minHashLshPairs: the scale path. Per-doc signature (k minhashes) via
  *    one groupBy; candidates only where a band collides (banded LSH), then
  *    exact-Jaccard verification on the candidates. Shuffles are
  *    O(docs·bands), never O(docs²).
  *  - simHash: 64-bit signature per doc; near-dups = hamming ≤ r, candidates
  *    via 4-block pigeonhole join, verified with xor+bit_count.
  */
object Dedup {

  /** Word n-gram shingles (distinct), e.g. n=3. Empty array when the doc has
    * fewer than n tokens (never a descending `sequence`).
    *
    * NOTE: higher-order functions (transform/aggregate) are interpreted, not
    * codegen'd — this Column form is the declarative spec, but the hot paths
    * below use [[shingleSets]]' typed flatMap, which benched ~10x faster on
    * the same corpus. */
  def shingles(text: Column, n: Int = 3): Column = {
    val ws = split(text, " ")
    val idx = sequence(lit(1), size(ws) - (n - 1)) // 1-based start positions
    val grams = transform(idx, i =>
      concat_ws(" ", (0 until n).map(o => element_at(ws, i + o)): _*))
    array_distinct(when(size(ws) >= n, grams).otherwise(array()))
  }

  /** JVM-native shingle generation (identical semantics to [[shingles]]:
    * space-split, n-gram join with single spaces, order-preserving
    * distinct). */
  private def shingleSeq(text: String, n: Int): IndexedSeq[String] = {
    val ws = text.split(" ", -1)
    if (ws.length < n) IndexedSeq.empty
    else (0 to ws.length - n).map(i => ws.slice(i, i + n).mkString(" ")).distinct
  }

  /** Exact duplicate groups: one row per distinct text, the smallest doc_id
    * as the canonical keeper. */
  def exactGroups(docs: DataFrame, idCol: String = "doc_id", textCol: String = "text"): DataFrame =
    docs.groupBy(textCol)
      .agg(min(col(idCol)).as("keep_id"), count(lit(1)).as("n_copies"))
      .drop(textCol)

  /** Per-doc distinct shingle sets — one narrow pass, no shuffle. */
  private def shingleSets(docs: DataFrame, idCol: String, textCol: String, n: Int) = {
    val spark = docs.sparkSession
    import spark.implicits._
    docs.select(col(idCol).cast("long"), col(textCol))
      .as[(Long, String)]
      .map { case (id, text) => (id, shingleSeq(text, n)) }
      .toDF("did", "set")
  }

  /** (did, set-size, one shingle per row) — the inverted-index input. The
    * set size rides along so Jaccard needs NO extra join after the pair
    * aggregation (an earlier version re-joined per-doc counts onto the
    * millions-of-candidate-pairs intermediate — 10x slower). */
  private def explodedShingles(docs: DataFrame, idCol: String, textCol: String, n: Int) = {
    val spark = docs.sparkSession
    import spark.implicits._
    docs.select(col(idCol).cast("long"), col(textCol))
      .as[(Long, String)]
      .flatMap { case (id, text) =>
        val sh = shingleSeq(text, n)
        sh.iterator.map(s => (id, sh.length, s))
      }
      .toDF("did", "nsh", "sh")
  }

  /** Exact shingle-Jaccard near-dup pairs at/above `threshold`.
    * Inverted-index self-join on shingle, count shared, then
    * |A∩B| / (|A|+|B|-|A∩B|). Exactly two shuffles: the shingle-key join
    * and the pair aggregation. */
  def shingleJaccardPairs(docs: DataFrame, threshold: Double,
      idCol: String = "doc_id", textCol: String = "text", n: Int = 3): DataFrame = {
    // join on the 64-bit shingle hash, not the string: smaller shuffle/build
    // rows and long-vs-long key compares (collision odds at 1e6 distinct
    // shingles ~1e-7, and the DuckDB oracle would surface one)
    val sh = explodedShingles(docs, idCol, textCol, n)
      .select(col("did"), col("nsh"), xxhash64(col("sh")).as("sh"))
    val inter = sh.as("a").join(sh.as("b"),
        col("a.sh") === col("b.sh") && col("a.did") < col("b.did"))
      .groupBy(col("a.did").as("id_a"), col("b.did").as("id_b"),
        col("a.nsh").as("na"), col("b.nsh").as("nb"))
      .agg(count(lit(1)).as("inter"))
    val j = col("inter").cast("double") / (col("na") + col("nb") - col("inter"))
    inter.where(j >= threshold)
      .select(col("id_a"), col("id_b"), (round((j) * 1000000.0) / 1000000.0).as("jaccard"))
  }

  /** MinHash-LSH near-dup pairs: k hash functions in b bands of r rows
    * (k = b*r); candidate pairs collide on at least one band, then are
    * verified with exact Jaccard over their shingle sets. */
  def minHashLshPairs(docs: DataFrame, threshold: Double,
      idCol: String = "doc_id", textCol: String = "text",
      n: Int = 3, bands: Int = 8, rowsPerBand: Int = 2): DataFrame = {
    val k = bands * rowsPerBand
    val sh = explodedShingles(docs, idCol, textCol, n)
    // k minhash values per doc in one map-side-combinable aggregation
    val sigCols = (0 until k).map(j => min(xxhash64(lit(j), col("sh"))).as(s"m$j"))
    val sig = sh.groupBy("did").agg(sigCols.head, sigCols.tail: _*)
    // band keys: hash of each band's r signature values. All band keys are
    // computed in ONE pass and unpivoted with posexplode — a per-band
    // union would re-run the whole shingle+agg lineage `bands` times.
    val bandKeyArr = array((0 until bands).map { b =>
      xxhash64((0 until rowsPerBand).map(r => col(s"m${b * rowsPerBand + r}")): _*)
    }: _*)
    val bandRows = sig.select(col("did"), posexplode(bandKeyArr))
      .toDF("did", "band", "bkey")
    val cand = bandRows.as("x").join(bandRows.as("y"),
        col("x.band") === col("y.band") && col("x.bkey") === col("y.bkey") &&
          col("x.did") < col("y.did"))
      .select(col("x.did").as("id_a"), col("y.did").as("id_b")).distinct()
    // exact verification against per-doc shingle sets. Sets are doc-bounded
    // (one array row per doc) — broadcast them so candidate verification
    // never shuffles; at corpus sizes past broadcast limits, swap to a
    // shuffle join on id (cands are already distinct + key-partitioned).
    val sets = broadcast(shingleSets(docs, idCol, textCol, n))
    val j = size(array_intersect(col("sa.set"), col("sb.set"))).cast("double") /
      size(array_union(col("sa.set"), col("sb.set")))
    cand
      .join(sets.as("sa"), col("id_a") === col("sa.did"))
      .join(sets.as("sb"), col("id_b") === col("sb.did"))
      .where(j >= threshold)
      .select(col("id_a"), col("id_b"), (round((j) * 1000000.0) / 1000000.0).as("jaccard"))
  }

  /** 64-bit SimHash per doc over whitespace tokens: bit b of the signature
    * is 1 iff the sum of ±1 votes (from bit b of each token's xxhash64) is
    * positive. */
  def simHash(docs: DataFrame, idCol: String = "doc_id", textCol: String = "text"): DataFrame = {
    val tok = docs.select(col(idCol).as("did"),
      explode(split(col(textCol), " ")).as("w"))
      .withColumn("h", xxhash64(col("w")))
    val votes = (0 until 64).map { b =>
      sum(when(shiftright(col("h"), b).bitwiseAND(1) === 1, 1).otherwise(-1)).as(s"v$b")
    }
    val agg = tok.groupBy("did").agg(votes.head, votes.tail: _*)
    val sig = (0 until 64).map { b =>
      when(col(s"v$b") > 0, shiftleft(lit(1L), b)).otherwise(0L)
    }.reduce((a, c) => a.bitwiseOR(c))
    agg.select(col("did").as("doc_id"), sig.as("simhash"))
  }

  /** SimHash near-dup pairs with hamming distance <= maxDist (< 16):
    * 4-block pigeonhole candidates (hd<=15 forces >=1 identical 16-bit
    * block), verified via bit_count(xor). */
  def simHashPairs(docs: DataFrame, maxDist: Int,
      idCol: String = "doc_id", textCol: String = "text"): DataFrame = {
    require(maxDist < 16, "4-block pigeonhole requires maxDist < 16")
    val sig = simHash(docs, idCol, textCol)
    val blockArr = array((0 until 4).map { blk =>
      shiftright(col("simhash"), blk * 16).bitwiseAND(0xFFFFL)
    }: _*)
    val blocks = sig.select(col("doc_id"), col("simhash"), posexplode(blockArr))
      .toDF("doc_id", "simhash", "blk", "bkey")
    val hd = bit_count(col("x.simhash").bitwiseXOR(col("y.simhash")))
    blocks.as("x").join(blocks.as("y"),
        col("x.blk") === col("y.blk") && col("x.bkey") === col("y.bkey") &&
          col("x.doc_id") < col("y.doc_id"))
      .where(hd <= maxDist)
      .select(col("x.doc_id").as("id_a"), col("y.doc_id").as("id_b"),
        hd.cast("long").as("hamming"))
      .distinct()
  }
}
