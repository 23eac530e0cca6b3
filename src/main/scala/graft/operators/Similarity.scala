package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Similarity search over embedding columns (Array[Float]).
  *
  * SCALE design:
  *  - cosine/dot are pure fold expressions (functions.aggregate over
  *    zip_with) — codegen'd, no UDF, no shuffle.
  *  - bruteForceTopK broadcasts the QUERY vector(s) and streams the corpus
  *    once; global top-k is TakeOrderedAndProject (never a full sort). The
  *    right baseline, linear in corpus size.
  *  - lshTopK is the sublinear path: sign-random-projection (SRP) bucket
  *    keys from deterministic hash-derived hyperplanes; candidates share a
  *    bucket in at least one of `tables` hash tables, then exact cosine
  *    re-ranks. Probe cost O(candidates), not O(corpus).
  */
object Similarity {

  /** Codegen'd kernels (graft.expressions.VectorExpressions); the HOF folds
    * below are the declarative spec they're verified against. */
  def dot(a: Column, b: Column): Column = graft.expressions.VectorFunctions.vec_dot(a, b)

  def cosine(a: Column, b: Column): Column = graft.expressions.VectorFunctions.cosine_sim(a, b)

  def norm(a: Column): Column = sqrt(dot(a, a))

  /** Interpreted higher-order-function fold — same summation order as the
    * codegen kernel; kept for bit-exact cross-checking in specs. */
  private[graft] def dotHof(a: Column, b: Column): Column =
    aggregate(zip_with(a.cast("array<double>"), b.cast("array<double>"), _ * _),
      lit(0.0), (acc, x) => acc + x)

  private[graft] def cosineHof(a: Column, b: Column): Column =
    dotHof(a, b) / (sqrt(dotHof(a, a)) * sqrt(dotHof(b, b)))

  /** Exact top-k neighbors of one query vector (given as its id in the
    * corpus). Returns (vec_id, cos) ordered by similarity. */
  def bruteForceTopK(emb: DataFrame, queryId: Long, k: Int,
      idCol: String = "vec_id", vecCol: String = "embedding"): DataFrame = {
    val q = emb.where(col(idCol) === queryId)
      .select(col(vecCol).cast("array<double>").as("qv"))
    emb.where(col(idCol) =!= queryId)
      .crossJoin(broadcast(q))
      .select(col(idCol), (round((cosine(col(vecCol), col("qv"))) * 1000000.0) / 1000000.0).as("cos"))
      .orderBy(col("cos").desc, col(idCol))
      .limit(k)
  }

  /** Batched exact top-k: ALL of `queryIds` answered in ONE corpus scan
    * — the shape a production retrieval pass actually runs (per-query
    * loops re-scan the corpus |Q| times). The query set broadcasts
    * (bounded by the caller — it is the batch, not the corpus), the
    * scan crosses each corpus vector with the broadcast batch, and the
    * per-query cut is a query-keyed window — Spark 4 plans it as
    * WindowGroupLimit, pruning to k per query map-side BEFORE the
    * shuffle, so the exchange carries |Q|·k rows, not |Q|·N. Output:
    * (query_id, idCol, cos, rnk), ties (cos desc, id). */
  def bruteForceTopKBatch(emb: DataFrame, queryIds: Seq[Long], k: Int,
      idCol: String = "vec_id", vecCol: String = "embedding"): DataFrame = {
    require(queryIds.nonEmpty)
    val q = emb.where(col(idCol).isin(queryIds: _*))
      .select(col(idCol).as("query_id"),
        col(vecCol).cast("array<double>").as("qv"))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy("query_id").orderBy(col("cos").desc, col(idCol))
    emb.crossJoin(broadcast(q))
      .where(col(idCol) =!= col("query_id"))
      .select(col("query_id"), col(idCol),
        (round(cosine(col(vecCol), col("qv")) * 1000000.0) / 1000000.0)
          .as("cos"))
      .withColumn("rnk", row_number().over(w))
      .where(col("rnk") <= k)
  }

  /** Deterministic pseudo-random hyperplane component for (table, plane,
    * dim): a zero-mean value derived from a 64-bit avalanche hash. Defined
    * as a column expression so plan + codegen stay pure. */
  private def planeComponent(table: Int, plane: Int, dim: Column): Column =
    (pmod(xxhash64(lit(table * 131 + plane), dim), lit(2001L)) - 1000L).cast("double")

  /** SRP bucket key for one table, as interpreted higher-order-function
    * folds: `planes` sign bits packed into a long. This is the declarative
    * SPEC of the bucketing — the hot paths use the codegen'd
    * [[graft.expressions.SrpBucketKeys]], proven bit-identical in
    * ScaleSafetySpec. */
  private[graft] def srpKeyHof(vec: Column, table: Int, planes: Int): Column =
    (0 until planes).map { p =>
      val proj = aggregate(zip_with(vec.cast("array<double>"),
        sequence(lit(0), size(vec) - 1).cast("array<double>"),
        (x, i) => x * planeComponent(table, p, i.cast("long"))),
        lit(0.0), (acc, x) => acc + x)
      when(proj > 0, shiftleft(lit(1L), p)).otherwise(0L)
    }.reduce((a, b) => a.bitwiseOR(b))

  /** All `tables` SRP bucket keys in one codegen'd pass (array<long>). */
  private def srpKeys(vec: Column, tables: Int, planes: Int): Column =
    graft.expressions.SrpBucketKeys.srp_bucket_keys(vec, tables, planes)

  /** Bucketed ANN: candidates collide with the query in >=1 of `tables` SRP
    * tables, then exact cosine re-ranks and keeps k. Recall grows with
    * `tables`, probe cost shrinks with `planes`. */
  def lshTopK(emb: DataFrame, queryId: Long, k: Int,
      tables: Int = 12, planes: Int = 4,
      idCol: String = "vec_id", vecCol: String = "embedding"): DataFrame = {
    val keyArr = srpKeys(col(vecCol), tables, planes)
    val keyed = emb.select(col(idCol), col(vecCol), posexplode(keyArr))
      .toDF(idCol, vecCol, "tbl", "bkey")
    val qKeys = broadcast(keyed.where(col(idCol) === queryId)
      .select(col("tbl").as("q_tbl"), col("bkey").as("q_bkey"),
        col(vecCol).cast("array<double>").as("qv")))
    val cand = keyed.where(col(idCol) =!= queryId)
      .join(qKeys, col("tbl") === col("q_tbl") && col("bkey") === col("q_bkey"))
      .select(col(idCol), col(vecCol), col("qv"))
      .dropDuplicates(idCol)
    cand.select(col(idCol), (round((cosine(col(vecCol), col("qv"))) * 1000000.0) / 1000000.0).as("cos"))
      .orderBy(col("cos").desc, col(idCol))
      .limit(k)
  }

  /** IVF (inverted-file) ANN index: a coarse k-means quantizer assigns every
    * vector to its nearest centroid; a query probes only the `nprobe`
    * closest cells, then exact cosine re-ranks. Deterministic: centroids
    * seed from the first k vectors by id, refined with a few Lloyd
    * iterations (per-iteration cost = one broadcast-join assignment + one
    * groupBy average; centroids themselves are k×dim doubles — driver-sized
    * by construction, not a data collect). */
  def ivfTopK(emb: DataFrame, queryId: Long, k: Int,
      nCells: Int = 16, nProbe: Int = 4, lloydIters: Int = 3,
      idCol: String = "vec_id", vecCol: String = "embedding"): DataFrame = {
    val spark = emb.sparkSession
    import spark.implicits._
    val vecs = emb.select(col(idCol), col(vecCol).cast("array<double>").as("v"))

    // Nearest-centroid assignment is per-row: embed the k×dim centroids as
    // array literals in ONE projection (array of sims → argmax via
    // array_position(array_max)). Zero shuffle, stays in whole-stage
    // codegen — vs the old crossJoin(k) + row_number window, which shuffled
    // k× the corpus per Lloyd iteration. Ties pick the smallest cell
    // (array_position returns the first occurrence), matching the old
    // (sim desc, cell asc) ordering.
    def assignTo(centroids: Seq[(Int, Seq[Double])]): DataFrame = {
      val simArr = array(centroids.sortBy(_._1).map { case (_, cv) =>
        graft.expressions.VectorFunctions.cosine_sim(col("v"), array(cv.map(lit): _*))
      }: _*)
      vecs.withColumn("cell",
        (array_position(simArr, array_max(simArr)) - 1).cast("int"))
    }

    var centroids = vecs.orderBy(idCol).limit(nCells)
      .select(col("v")).as[Seq[Double]].collect()
      .zipWithIndex.map { case (v, i) => (i, v) }.toSeq
    val dim = centroids.headOption.map(_._2.length).getOrElse(0)
    // empty corpus (or zero-dim vectors): no cells to probe — return an
    // empty frame with the (idCol, cos) result schema rather than letting
    // the Lloyd step call avgCols.head on an empty column list
    if (dim == 0)
      return vecs.select(col(idCol), lit(0.0).as("cos")).where(lit(false))
    (0 until lloydIters).foreach { _ =>
      // per-cell elementwise mean as `dim` avg columns: one map-side-
      // combinable shuffle of nCells×dim partial sums (no posexplode —
      // exploding n×dim rows through a two-level groupBy shuffled the
      // whole corpus ×dim per iteration)
      val avgCols = (0 until dim).map(i => avg(element_at(col("v"), i + 1)).as(s"m$i"))
      val means = assignTo(centroids)
        .groupBy("cell").agg(avgCols.head, avgCols.tail: _*)
        .collect()
        .map(r => r.getInt(0) -> (0 until dim).map(i => r.getDouble(i + 1)))
        .toMap
      centroids = centroids.map { case (i, old) => (i, means.getOrElse(i, old)) }
    }

    val assigned = assignTo(centroids)
    val qv = vecs.where(col(idCol) === queryId).select(col("v")).as[Seq[Double]].head()
    val probeCells = centroids
      .map { case (i, cv) =>
        val dot = cv.zip(qv).map { case (a, b) => a * b }.sum
        val n = math.sqrt(cv.map(x => x * x).sum) * math.sqrt(qv.map(x => x * x).sum)
        (i, if (n == 0) 0.0 else dot / n)
      }
      .sortBy { case (i, s) => (-s, i) }.take(nProbe).map(_._1).toSet
    val qdf = broadcast(Seq(Tuple1(qv)).toDF("qv"))
    assigned.where(col("cell").isin(probeCells.toSeq: _*) && col(idCol) =!= queryId)
      .crossJoin(qdf)
      .select(col(idCol), (round((cosine(col("v"), col("qv"))) * 1000000.0) / 1000000.0).as("cos"))
      .orderBy(col("cos").desc, col(idCol))
      .limit(k)
  }

  /** Embedding near-dup pairs with cosine >= threshold — SRP-bucketed
    * candidates + exact cosine verification. Candidate pairs must collide
    * in >= 1 of `tables` SRP hash tables (equi-join on (table, bucket) —
    * never an all-pairs product), then are verified with the exact codegen'd
    * cosine via id-keyed shuffle joins back to the vectors. At threshold
    * 0.8 (angle <= 37°) a plane agrees w.p. ~0.795, so 28 tables × 6
    * planes catch a boundary pair w.p. 1-(1-0.795^6)^28 ≈ 0.9997 — the
    * same recall the old 16 × 4 scheme had, but with 4x the buckets per
    * table the RANDOM collision volume (candidates ∝ tables/2^planes)
    * drops ~2.3x; measured 2.2 s → 1.6 s on the q101 drive at sf0.1
    * (Q101Time; 10 planes starts losing to signature cost). Recall vs
    * the exact form is spec-checked on planted duplicates.
    *
    * `maxBucket` is the hot-bucket guard a web-scale corpus needs:
    * degenerate vectors (zero/near-zero embeddings, hub points, encoder
    * failure modes that emit one constant vector) all land in the SAME
    * bucket of every table, and an m-member bucket emits m²/2 candidates
    * — one million bad rows becomes 5·10^11 pairs. With a cutoff, buckets
    * larger than `maxBucket` are dropped from CANDIDATE GENERATION
    * (counted first with a map-side-combined aggregation, then
    * anti-joined — the q77 hot-set shape, no broadcast assumption). A
    * true near-dup pair inside a dropped bucket is still found through
    * any of its other `tables`-1 buckets, so only pairs whose EVERY
    * bucket is hot lose recall — exactly the degenerate mass the guard
    * exists to excise. Off by default: the oracle-checked rows prove the
    * unguarded form exact. */
  def nearDupPairs(emb: DataFrame, threshold: Double,
      idCol: String = "vec_id", vecCol: String = "embedding",
      tables: Int = 28, planes: Int = 6,
      maxBucket: Option[Long] = None): DataFrame = {
    val keyArr = srpKeys(col(vecCol), tables, planes)
    // checkpoint the signature relation BEFORE the guard branch: the
    // tables×planes SRP dot products are read by both self-join sides
    // AND (when capped) the hot-bucket count + anti-join probe, so the
    // seam here makes the kernel run ONCE per vector in every branch.
    // The materialized (did, tbl, bkey) rows are ~24 bytes × tables per
    // vector — smaller than the embedding column they replace, so the
    // seam is cheaper than any recompute at any corpus size.
    val keyed0 = emb.select(col(idCol).as("did"), posexplode(keyArr))
      .toDF("did", "tbl", "bkey")
      .localCheckpoint()
    val keyedCk = maxBucket match {
      case None => keyed0
      case Some(cap) =>
        val hot = keyed0.groupBy("tbl", "bkey")
          .agg(count(lit(1)).as("members"))
          .where(col("members") > cap)
          .select("tbl", "bkey")
        // the anti-join output feeds both self-join sides: one more
        // (smaller) materialization beats running the probe join twice
        val ck = keyed0.join(hot, Seq("tbl", "bkey"), "left_anti")
          .localCheckpoint()
        // keyed0's only consumers (the hot count + this anti-join) are
        // done the moment ck materializes (localCheckpoint is eager):
        // release the superseded blocks deterministically instead of
        // leaving them to ContextCleaner timing
        IterUtils.unpersistCheckpoint(keyed0)
        ck
    }
    val cand = keyedCk.as("x").join(keyedCk.as("y"),
        col("x.tbl") === col("y.tbl") && col("x.bkey") === col("y.bkey") &&
          col("x.did") < col("y.did"))
      .select(col("x.did").as("id_a"), col("y.did").as("id_b"))
      .distinct()
    val vecs = emb.select(col(idCol).as("did"), col(vecCol).as("v"))
    cand
      .join(vecs.as("va"), col("id_a") === col("va.did"))
      .join(vecs.as("vb"), col("id_b") === col("vb.did"))
      .select(col("id_a"), col("id_b"),
        (round((cosine(col("va.v"), col("vb.v"))) * 1000000.0) / 1000000.0).as("cos"))
      .where(col("cos") >= threshold)
  }

  /** SemDeDup-style semantic deduplication: drop all but one document of
    * every group whose EMBEDDINGS are mutually near-duplicate (cosine >=
    * `threshold`), keeping the minimum id per group — the embedding-space
    * twin of text-level near-dup clustering (Abbas et al. 2023,
    * "SemDeDup"). Composition of two already-scale-shaped pieces:
    * [[nearDupPairs]] (SRP-bucketed candidate generation — never
    * all-pairs) feeds [[Dedup.duplicateClusters]] (pointer-jumping
    * connected components, so transitive chains A~B~C collapse to ONE
    * survivor even when cos(A,C) < threshold), and the kept set is a
    * left-anti join of the corpus against the non-root members. Vectors
    * with no qualifying neighbor never enter the component computation
    * and survive untouched — the CC input is bounded by the PAIR count,
    * not the corpus.
    *
    * `maxBucket` passes through to [[nearDupPairs]]'s hot-bucket guard —
    * and matters MOST here: encoder failure modes that emit one constant
    * embedding are precisely the degenerate mass SemDeDup corpora carry,
    * and an m-member hot bucket emits m²/2 candidate pairs. Off by
    * default so the oracle rows prove the exact form. */
  def semanticDedup(emb: DataFrame, threshold: Double,
      idCol: String = "vec_id", vecCol: String = "embedding",
      tables: Int = 28, planes: Int = 6,
      maxBucket: Option[Long] = None): DataFrame = {
    val clusters = Dedup.duplicateClusters(
      nearDupPairs(emb, threshold, idCol, vecCol, tables, planes, maxBucket))
    val losers = clusters.where(col("doc_id") =!= col("cluster"))
      .select(col("doc_id").as(idCol))
    emb.join(losers, Seq(idCol), "left_anti")
  }

  /** SemDeDup as the PAPER actually runs it (Abbas et al. 2023 §3): the
    * corpus is first k-means-clustered in embedding space, then near-dup
    * detection runs all-pairs WITHIN each cluster only. The contract
    * that makes this scale is the paper's own: `k` is chosen large
    * enough that expected cluster size N/k is pairable — per-cluster
    * candidate work is (N/k)²/2, and the cluster-keyed self-join
    * shuffles each vector once. A duplicate pair split across two
    * k-means clusters is MISSED by construction (the paper accepts this
    * boundary loss; [[semanticDedup]]'s 28-table SRP variant is the
    * recall-hedged alternative when that matters). `maxCluster` is the
    * degenerate-mass guard, same argument as [[nearDupPairs]]'s
    * `maxBucket`: a constant-embedding failure mode collapses into ONE
    * cluster of m members ⇒ m²/2 pairs; clusters larger than the cap
    * are excised from candidate generation entirely (counted first,
    * anti-joined — no broadcast assumption). Off by default so the
    * oracle rows prove the exact form.
    *
    * Downstream is the proven tail: rounded-cosine exact verification
    * (the 1e-6 rounding both engines agree on), pointer-jumping
    * connected components, keep-min-id, left-anti against the corpus. */
  /** The SemDeDup paper's cluster-count sizing rule made executable:
    * pick k from the corpus so EXPECTED cluster size stays near
    * `targetClusterSize`. Per-cluster candidate mass is (N/k)²/2, so a
    * PINNED k turns linear data growth into quadratic pair growth — the
    * r13 sf1 stress measured exactly that (k=8 → 10× data, ~100×
    * runtime on the clustered-dedup pipelines); holding cluster SIZE
    * constant keeps total pair work linear in N. `floorK` anchors
    * small corpora — including the pinned sf0.01 oracle evaluations,
    * where the rule lands exactly on the floor, so the unrolled
    * fixed-k oracle SQL stays bit-exact. Cost: one count(*) over the
    * (usually raw-parquet) corpus — footer-statistics cheap next to
    * the dedup it sizes. */
  def scaledK(emb: DataFrame, targetClusterSize: Int = 512,
      floorK: Int = 8): Int =
    math.max(floorK, (emb.count() / targetClusterSize).toInt)

  /** SRP plane-count sizing, the [[scaledK]] argument applied to
    * [[nearDupPairs]]/[[semanticDedup]]: a table has 2^planes buckets,
    * so FIXED planes turn linear corpus growth into quadratic
    * random-collision candidate mass (expected bucket size N/2^planes;
    * the r13 sf1 stress measured q101 going 1.6 s → 111 s warm on 10×
    * data). Scaling planes holds expected bucket size near
    * `targetBucket`, keeping collision candidates linear in N. The
    * trade is RECALL, not correctness of emitted pairs (verification
    * stays exact): a plane agrees w.p. ~0.795 on a cos-0.8 boundary
    * pair, so at the same 28 tables recall falls from ~0.9997 (6
    * planes) to ~0.95 (10 planes) — raise `tables` alongside when
    * exhaustive recall matters. At the floor the pinned sf0.01 oracle
    * sees the exact 28×6 scheme unchanged. */
  def scaledPlanes(emb: DataFrame, targetBucket: Int = 80,
      floorPlanes: Int = 6): Int = {
    val n = emb.count().toDouble
    math.max(floorPlanes,
      math.ceil(math.log(n / targetBucket) / math.log(2.0)).toInt)
  }

  def semanticDedupClustered(emb: DataFrame, threshold: Double,
      k: Int, iters: Int,
      idCol: String = "vec_id", vecCol: String = "embedding",
      maxCluster: Option[Long] = None): DataFrame = {
    val assign = Clustering.kMeansAssign(emb, k, iters, idCol, vecCol)
      .select(col(idCol).as("did"), col("cluster"))
    // the assignment relation is read by BOTH sides of the cluster-keyed
    // self-join (and the hot-cluster count when capped): checkpoint it
    // once instead of re-running the NearestCentroid kernel + the
    // emb⋈assign join per consumer. Cost: ONE materialization of
    // (id, vector, cluster) — smaller than two extra kernel passes over
    // the corpus, and in pipeline compositions (q133/q143) `emb` is
    // itself an expensive survivor subtree this seam stops re-executing.
    val vecs = emb.select(col(idCol).as("did"), col(vecCol).as("v"))
      .join(assign, Seq("did"))
      .localCheckpoint()
    val scoped = maxCluster match {
      case None => vecs
      case Some(cap) =>
        val hot = vecs.groupBy("cluster").agg(count(lit(1)).as("members"))
          .where(col("members") > cap).select("cluster")
        vecs.join(hot, Seq("cluster"), "left_anti")
    }
    val pairs = scoped.as("a").join(scoped.as("b"),
        col("a.cluster") === col("b.cluster") && col("a.did") < col("b.did"))
      .select(col("a.did").as("id_a"), col("b.did").as("id_b"),
        (round((cosine(col("a.v"), col("b.v"))) * 1000000.0) / 1000000.0)
          .as("cos"))
      .where(col("cos") >= threshold)
      .select("id_a", "id_b")
    val comp = Dedup.duplicateClusters(pairs)
    val losers = comp.where(col("doc_id") =!= col("cluster"))
      .select(col("doc_id").as(idCol))
    emb.join(losers, Seq(idCol), "left_anti")
  }

  /** Hard-negative mining for contrastive training (the DPR/SimCSE data
    * shape): for each anchor vector, its best POSITIVE — the most-similar
    * vector in the SAME k-means cluster — and its top-`nNeg` HARD
    * NEGATIVES — the most-similar vectors in the anchor's NEAREST
    * COMPETING cluster (the runner-up centroid of
    * [[Clustering.kMeansAssignRunnerUp]]). Random negatives are easy and
    * teach nothing; the hardest useful negatives live just across the
    * nearest cluster boundary, which is exactly where the runner-up
    * centroid points.
    *
    * Output: one row per (anchor, role, rank) — (idCol, kind 'pos'|'neg',
    * rnk, other_id, cos) with cosine rounded to 1e-6 (the cross-engine
    * contract q132 established) and ties broken on (cos DESC, other_id).
    * A singleton cluster yields no 'pos' row for its member; an empty
    * runner-up cluster yields no 'neg' rows — both are real absences, not
    * sentinel rows.
    *
    * SCALE: the q132 within-cluster contract, twice — candidates are
    * (anchor x own-cluster members) for positives and (anchor x
    * runner-up-cluster members) for negatives, both cluster-keyed joins
    * whose pair mass is bounded by k sizing the pairable cluster, never
    * all-pairs. The per-anchor top-k is a vid-keyed window (keyed, never
    * one-partition), and the assignment rides the scan-speed
    * NearestCentroid2 kernel — the runner-up costs no second pass. */
  def hardNegatives(emb: DataFrame, k: Int, iters: Int, nNeg: Int = 3,
      idCol: String = "vec_id", vecCol: String = "embedding"): DataFrame = {
    require(nNeg > 0, s"nNeg must be positive: $nNeg")
    val asg = Clustering.kMeansAssignRunnerUp(emb, k, iters, idCol, vecCol)
      .select(col(idCol).as("did"), col("cluster"), col("cluster2"))
    val av = emb.select(col(idCol).as("did"), col(vecCol).cast("array<double>").as("v"))
      .join(asg, Seq("did"))
      .localCheckpoint() // read 4× (both sides of pos AND neg joins)
    def ranked(pairs: DataFrame, kind: String, keep: Int): DataFrame = {
      val w = org.apache.spark.sql.expressions.Window
        .partitionBy("vid").orderBy(col("cos").desc, col("other_id"))
      pairs.withColumn("rnk", row_number().over(w))
        .where(col("rnk") <= keep)
        .select(col("vid"), lit(kind).as("kind"), col("rnk"),
          col("other_id"), col("cos"))
    }
    val rcos = round(cosine(col("a.v"), col("b.v")) * 1000000.0) / 1000000.0
    val pos = av.as("a").join(av.as("b"),
        col("a.cluster") === col("b.cluster") && col("a.did") =!= col("b.did"))
      .select(col("a.did").as("vid"), col("b.did").as("other_id"), rcos.as("cos"))
    val neg = av.as("a").join(av.as("b"), col("a.cluster2") === col("b.cluster"))
      .select(col("a.did").as("vid"), col("b.did").as("other_id"), rcos.as("cos"))
    ranked(pos, "pos", 1).unionByName(ranked(neg, "neg", nNeg))
  }

  /** Symmetric per-vector int8 quantization: scale = max(|v_i|)/127,
    * q_i = floor(v_i/scale + 0.5) ∈ [-127, 127] (zero vectors quantize to
    * zeros). 4x smaller embedding storage/shuffle for ANN at corpus scale;
    * reconstruction error per component is bounded by scale/2
    * (spec-checked). Every step is deterministic IEEE double arithmetic,
    * so the DuckDB oracle reproduces the exact codes. */
  def quantizeInt8(emb: DataFrame,
      idCol: String = "vec_id", vecCol: String = "embedding"): DataFrame = {
    val v = col(vecCol).cast("array<double>")
    val sc = array_max(transform(v, x => abs(x))) / lit(127.0)
    emb.select(col(idCol),
      when(sc === 0, transform(v, _ => lit(0L)))
        .otherwise(transform(v, x => floor(x / sc + 0.5))).as("q"),
      (round(sc * 1000000000.0) / 1000000000.0).as("qscale"))
  }

  /** Two-stage ANN over int8-quantized codes: stage 1 scores the corpus
    * with the CHEAP reconstruction dot product
    * (qscale_a·qscale_b·dot(codes_a, codes_b) ≈ dot(a, b) — int8 codes are
    * 4x smaller to scan/shuffle and the dot runs on the codegen'd kernel),
    * keeps the top `rerank`; stage 2 re-ranks those exactly on the full
    * vectors and returns k. The quantized estimate ranks by DOT while the
    * final metric is cosine, so `rerank` must absorb norm variation —
    * recall vs brute force is spec-checked (PipelineOpsSpec). */
  def int8TopK(emb: DataFrame, queryId: Long, k: Int, rerank: Int = 50,
      idCol: String = "vec_id", vecCol: String = "embedding"): DataFrame = {
    val codes = quantizeInt8(emb, idCol, vecCol)
    val qc = broadcast(codes.where(col(idCol) === queryId)
      .select(col("q").as("qq"), col("qscale").as("qqs")))
    val cand = codes.where(col(idCol) =!= queryId)
      .crossJoin(qc)
      .select(col(idCol),
        (col("qscale") * col("qqs") * dot(col("q"), col("qq"))).as("est"))
      .orderBy(col("est").desc, col(idCol))
      .limit(rerank)
    val qv = broadcast(emb.where(col(idCol) === queryId)
      .select(col(vecCol).cast("array<double>").as("qv")))
    cand.join(emb.select(col(idCol), col(vecCol)), idCol)
      .crossJoin(qv)
      .select(col(idCol), (round((cosine(col(vecCol), col("qv"))) * 1000000.0) / 1000000.0).as("cos"))
      .orderBy(col("cos").desc, col(idCol))
      .limit(k)
  }

  /** All-pairs exact form of [[nearDupPairs]] — O(n²), kept ONLY as the
    * spec reference for recall checks on small planted corpora. Never
    * register this against a raw corpus: the id_a < id_b join is a
    * cartesian product. */
  private[graft] def nearDupPairsExact(emb: DataFrame, threshold: Double,
      idCol: String = "vec_id", vecCol: String = "embedding"): DataFrame = {
    val a = emb.select(col(idCol).as("id_a"), col(vecCol).as("va"))
    val b = emb.select(col(idCol).as("id_b"), col(vecCol).as("vb"))
    a.join(b, col("id_a") < col("id_b"))
      .select(col("id_a"), col("id_b"), (round((cosine(col("va"), col("vb"))) * 1000000.0) / 1000000.0).as("cos"))
      .where(col("cos") >= threshold)
  }

  /** Pairwise cosine between per-LABEL centroid embeddings — the
    * cluster-separation / source-drift readout over an embedded corpus
    * (two labels whose centroids drift together are collapsing; a
    * label drifting from its own history is shifting domain).
    *
    * Centroids come from exact integer-quantized dimension sums (the
    * q160 convention: one posexplode into a (label, dim)-keyed
    * map-side-combined aggregation — nothing row-sized shuffles); the
    * pairwise cosine runs on the LABEL-sized centroid relation
    * (dim-aligned self-join, |labels|² output). */
  def labelCentroidCosines(emb: DataFrame, labelCol: String = "label",
      vecCol: String = "embedding"): DataFrame = {
    val q = transform(col(vecCol),
      x => round(x.cast("double") * 10000.0).cast("long"))
    val sums = emb.select(col(labelCol).as("lbl"), posexplode(q).as(Seq("i", "v")))
      .groupBy("lbl", "i")
      .agg(sum("v").as("s"), count(lit(1)).as("c"))
      .select(col("lbl"), col("i"),
        (col("s").cast("double") / (lit(10000.0) * col("c").cast("double")))
          .as("v"))
    val a = sums.select(col("lbl").as("la"), col("i"), col("v").as("va"))
    val b = sums.select(col("lbl").as("lb"), col("i"), col("v").as("vb"))
    a.join(b, Seq("i")).where(col("la") < col("lb"))
      .groupBy("la", "lb")
      .agg(sum(col("va") * col("vb")).as("dot"),
        sum(col("va") * col("va")).as("na"),
        sum(col("vb") * col("vb")).as("nb"))
      .select(col("la"), col("lb"),
        (round(col("dot") / (sqrt(col("na")) * sqrt(col("nb"))) * 1000000.0)
          / 1000000.0).as("cos"))
  }

  /** Per-label embedding anisotropy profile: average vector norm, the
    * label-centroid norm, and their ratio — Ethayarajh (EMNLP '19)'s
    * anisotropy diagnostic (a ratio near 1 means vectors point one way
    * and cosine similarity is saturated; near 0 means an isotropic,
    * usable space). The embedding-health gate to read before trusting
    * any cosine threshold (q27/q101).
    *
    * Determinism: coordinates quantize to exact 1e-4 longs (the PCA
    * convention); per-row squared norms fold as exact long sums inside
    * a HOF; dimension sums accumulate in decimal(38,0). The only
    * cross-row float folds are the norm average and the 64-term
    * centroid sum, both display-rounded 4 dp.
    *
    * SCALE: one pass for the per-row norms (scan-speed HOF) + one
    * posexplode to a (label × dims)-sized exact sum table. */
  def anisotropyProfile(emb: DataFrame, labelCol: String = "label",
      vecCol: String = "embedding"): DataFrame = {
    val dec = org.apache.spark.sql.types.DecimalType(38, 0)
    val q = emb.select(col(labelCol).as("lab"),
      expr(s"transform($vecCol, x -> CAST(round(CAST(x AS DOUBLE) * 10000.0) AS LONG))")
        .as("q"))
    val rows = q.select(col("lab"),
      (sqrt(expr("aggregate(q, CAST(0 AS LONG), (a, x) -> a + x * x)")
        .cast("double")) / lit(10000.0)).as("norm"))
    val perLab = rows.groupBy("lab").agg(count(lit(1)).as("n"),
      round(avg(col("norm")), 4).as("avg_norm"))
    val dimSums = q.select(col("lab"), posexplode(col("q")).as(Seq("i", "v")))
      .groupBy("lab", "i").agg(sum(col("v")).cast(dec).as("s"))
    val meanDim = col("s").cast("double") / col("n").cast("double")
    val centroid = dimSums.join(perLab.select(col("lab"), col("n")), "lab")
      .groupBy("lab")
      .agg(sum(meanDim * meanDim).as("ss"))
      .select(col("lab"),
        round(sqrt(col("ss")) / lit(10000.0), 4).as("centroid_norm"))
    perLab.join(centroid, "lab")
      .select(col("lab").as("label"), col("n"), col("avg_norm"),
        col("centroid_norm"),
        round(col("centroid_norm") / col("avg_norm"), 4).as("anisotropy"))
      .orderBy("label")
  }

  /** Maximal Marginal Relevance re-ranking (Carbonell & Goldstein 1998)
    * with λ = 1/2 over the exact top-`poolK` pool of one query: greedily
    * select `selectK` results maximizing relevance minus the max
    * similarity to anything already selected — retrieval that refuses to
    * return five near-copies of the best hit.
    *
    * Determinism: both relevance and pairwise cosines are quantized to
    * 1e-6 micro-units (LONG) BEFORE any comparison, so every greedy
    * argmax is an exact integer comparison with vec_id tie-break — no
    * float-ulp selection flips between engines, and λ = 1/2 drops out of
    * the argmax entirely (score ∝ rel_u − maxsim_u). Round 1's "max
    * similarity to the empty set" is 0 by convention.
    *
    * SCALE: the pool cut is [[bruteForceTopK]] (one corpus scan,
    * TakeOrderedAndProject); everything after runs on the poolK-sized
    * pool (pairwise table poolK², localCheckpoint'd once). The greedy
    * loop collects ONE argmax row per round — driver state is the
    * selection itself (selectK rows), the model-sized-collect
    * convention. Output: (rank, vec_id, rel, max_sim_sel, mmr). */
  def mmrRerank(emb: DataFrame, queryId: Long, poolK: Int, selectK: Int,
      idCol: String = "vec_id", vecCol: String = "embedding"): DataFrame = {
    val spark = emb.sparkSession
    import spark.implicits._
    val pool = bruteForceTopK(emb, queryId, poolK, idCol, vecCol)
      .select(col(idCol),
        round(col("cos") * 1000000.0).cast("long").as("rel_u"))
      .join(emb.select(col(idCol), col(vecCol).cast("array<double>").as("v")),
        Seq(idCol))
      .localCheckpoint() // feeds the pair table and every round's filter
    val pairs = pool.as("a").join(pool.as("b"),
        col(s"a.$idCol") =!= col(s"b.$idCol"))
      .select(col(s"a.$idCol").as("ia"), col(s"b.$idCol").as("ib"),
        (round(cosine(col("a.v"), col("b.v")) * 1000000.0)).cast("long")
          .as("sim_u"))
      .localCheckpoint()
    var selected = Vector.empty[(Long, Long, Long)] // (vec_id, rel_u, maxsim_u)
    for (_ <- 1 to selectK) {
      val selIds = selected.map(_._1)
      val cand = if (selIds.isEmpty) pool.select(col(idCol), col("rel_u"),
          lit(0L).as("maxsim_u"))
        else pool.where(!col(idCol).isin(selIds: _*))
          .join(pairs.where(col("ib").isin(selIds: _*))
            .groupBy(col("ia").as(idCol)).agg(max("sim_u").as("maxsim_u")),
            Seq(idCol))
          .select(col(idCol), col("rel_u"), col("maxsim_u"))
      val best = cand
        .orderBy((col("rel_u") - col("maxsim_u")).desc, col(idCol))
        .limit(1).collect().head // 1 row/round: the model-sized collect
      selected :+= ((best.getLong(0), best.getLong(1), best.getLong(2)))
    }
    IterUtils.unpersistCheckpoint(pool)
    IterUtils.unpersistCheckpoint(pairs)
    selected.zipWithIndex.map { case ((id, rel, ms), i) =>
      (i + 1L, id, rel / 1000000.0, ms / 1000000.0, (rel - ms) / 1000000.0)
    }.toDF("rnk", idCol, "rel", "max_sim_sel", "mmr")
  }

  /** Deterministic ±1 sign for the JL projection cell (i, j): parity of
    * the md5 of "i#j" — the [[graft.expressions.PortableHash]] family
    * evaluated at PLAN BUILD time, so both the engine plan and the
    * generated oracle SQL embed the same literal sign matrix. */
  def jlSign(i: Int, j: Int): Int = {
    val d = java.security.MessageDigest.getInstance("MD5")
      .digest(s"$i#$j".getBytes("UTF-8"))
    if ((d.last & 1) == 0) 1 else -1
  }

  /** Johnson-Lindenstrauss distortion audit: project d-dim embeddings to
    * `m` dims with the literal ±1 sign matrix [[jlSign]], then measure
    * ||ya−yb||²/(m·||va−vb||²) over all pairs of the audit prefix
    * (`auditIds` lowest vec_ids) — the empirical answer to "how many
    * random-projection dims does THIS corpus need before ANN recall
    * collapses". Achlioptas 2003 guarantees concentration near 1; the
    * emitted min/max/frac-within-[½,2] show the actual tails.
    *
    * Determinism: each projection component and each squared distance is
    * ONE index-ordered fold (functions.aggregate / list-comprehension
    * sum) over the same doubles in both engines; ratios are
    * display-rounded, and the [½,2] band count compares identical
    * doubles. SCALE: projection is a scan-speed per-row expression (the
    * sign matrix is m·d literals baked into the plan — the
    * [[Pca]]-projection shape); the pair audit is bounded by auditIds²,
    * a sample, never corpus². Output: 1 row. */
  def jlDistortion(emb: DataFrame, m: Int, auditIds: Int,
      dim: Int = 64, idCol: String = "vec_id",
      vecCol: String = "embedding"): DataFrame = {
    val proj = emb.where(col(idCol) < auditIds)
      .select(col(idCol), col(vecCol).cast("array<double>").as("v"))
      .select(col(idCol), array((0 until m).map { j =>
        (0 until dim).map { i =>
          element_at(col("v"), i + 1) * lit(jlSign(i, j).toDouble)
        }.reduce(_ + _)
      }: _*).as("y"), col("v"))
    val pairs = proj.as("a").join(proj.as("b"),
        col(s"a.$idCol") < col(s"b.$idCol"))
      .select(
        expr("aggregate(zip_with(a.v, b.v, (x, y) -> (x - y) * (x - y)), CAST(0.0 AS DOUBLE), (acc, e) -> acc + e)").as("dx"),
        expr("aggregate(zip_with(a.y, b.y, (x, y) -> (x - y) * (x - y)), CAST(0.0 AS DOUBLE), (acc, e) -> acc + e)").as("dy"))
      .where(col("dx") > 0.0)
      .select((col("dy") / (lit(m.toDouble) * col("dx"))).as("ratio"))
    pairs.agg(count(lit(1)).cast("long").as("n_pairs"),
      (round(avg("ratio") * 1000000.0) / 1000000.0).as("avg_ratio"),
      (round(min("ratio") * 1000000.0) / 1000000.0).as("min_ratio"),
      (round(max("ratio") * 1000000.0) / 1000000.0).as("max_ratio"),
      (round(sum(when(col("ratio") >= 0.5 && col("ratio") <= 2.0, 1L)
        .otherwise(0L)).cast("double") / count(lit(1)).cast("double")
        * 1000000.0) / 1000000.0).as("frac_within_2x"))
  }

  /** Facility-location greedy subset selection (submodular coverage —
    * the coreset recipe next to MMR diversification [[mmrRerank]] and
    * Gonzalez seeding): pick k rows maximizing
    * F(S) = Σ_v max_{c∈S} s(v, c), greedily by marginal gain. The
    * similarity is the register's rounded-cosine contract SHIFTED to
    * nonnegative integer micro-units (round(cos·10⁶) + 10⁶), so every
    * gain is an EXACT integer and the (gain desc, id asc) argmax has no
    * floating tie hazard — the q260 integer-micro-unit discipline.
    * Runs over the bounded audit prefix (the q321/q385 contract): the
    * pair similarities compute distributed through the codegen'd cosine
    * kernel, collect at prefix² model size, and the greedy loop is
    * driver-side on exact longs. At corpus scale the same loop runs
    * per-round distributed (one gain aggregation per pick, the q142
    * Gonzalez shape) — the prefix form is the oracle-able instance. */
  def facilityLocationSelect(emb: DataFrame, k: Int = 8,
      prefix: Int = 100): DataFrame = {
    val spark = emb.sparkSession
    import spark.implicits._
    // Version-stable similarity contract (the q129/q160 quantized
    // discipline): quantize each vector to exact longs (round(x*1e4)),
    // take INTEGER dot products — order-free and exact — then exactly
    // one IEEE op each for the norm product, sqrt, divide, and 1e6
    // scale. Every engine computing this sequence gets bit-identical
    // doubles, unlike a library cosine whose internal summation
    // order/FMA use may drift across builds and flip the round() at a
    // .5-ulp boundary.
    val e = emb.where(col("vec_id") < prefix)
      .select(col("vec_id"),
        expr("transform(embedding, x -> CAST(round(CAST(x AS DOUBLE) " +
          "* 10000.0) AS BIGINT))").as("q"))
      .withColumn("nn", expr("aggregate(zip_with(q, q, (x, y) -> x * y), " +
        "CAST(0 AS BIGINT), (a, v) -> a + v)"))
      .localCheckpoint()
    val sims = e.select(col("vec_id").as("ia"), col("q").as("qa"),
        col("nn").as("na"))
      .crossJoin(broadcast(e.select(col("vec_id").as("ib"),
        col("q").as("qb"), col("nn").as("nb"))))
      .select(col("ia"), col("ib"),
        (round(expr("aggregate(zip_with(qa, qb, (x, y) -> x * y), " +
            "CAST(0 AS BIGINT), (a, v) -> a + v)").cast("double")
          / sqrt(col("na").cast("double") * col("nb").cast("double"))
          * 1000000.0).cast("long") + 1000000L).as("sq"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    val ids = sims.map(_._1).distinct.sorted
    val vIdx = ids.zipWithIndex.toMap
    val cand = sims.map(_._2).distinct.sorted
    val s = Array.ofDim[Long](ids.length, cand.length)
    sims.foreach { case (ia, ib, sq) => s(vIdx(ia))(vIdx(ib)) = sq }
    val cover = new Array[Long](ids.length)
    val selected = scala.collection.mutable.LinkedHashMap.empty[Long, Long]
    for (_ <- 1 to k) {
      var bestJ = -1L; var bestGain = -1L
      cand.foreach { j =>
        if (!selected.contains(j)) {
          val jj = vIdx(j)
          var g = 0L
          var vv = 0
          while (vv < ids.length) {
            val d = s(vv)(jj) - cover(vv)
            if (d > 0) g += d
            vv += 1
          }
          if (g > bestGain || (g == bestGain && j < bestJ)) {
            bestGain = g; bestJ = j
          }
        }
      }
      val jj = vIdx(bestJ)
      var vv = 0
      while (vv < ids.length) {
        if (s(vv)(jj) > cover(vv)) cover(vv) = s(vv)(jj)
        vv += 1
      }
      selected += bestJ -> bestGain
    }
    selected.toSeq.zipWithIndex
      .map { case ((j, g), r) => (r + 1, j, g) }
      .toDF("rank", "vec_id", "gain_q")
      .select(col("rank").cast("int").as("rank"), col("vec_id"),
        col("gain_q"),
        (round(col("gain_q").cast("double") / 100.0) / 10000.0)
          .as("gain"))
      .orderBy("rank")
  }
}
