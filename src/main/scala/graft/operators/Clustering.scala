package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Distributed Lloyd k-means over an embedding column — the clustering
  * stage the SemDeDup recipe (Abbas et al. 2023) runs BEFORE its
  * within-cluster cosine dedup, and the training step behind q49's IVF
  * index: partition a corpus's embedding space so per-cluster work
  * (dedup, ANN probes, diversity sampling) never touches the full corpus.
  *
  * Cross-engine reproducibility is designed in, not hoped for:
  *   - vectors are quantized ONCE to integers (`round(x * scale)`), so
  *     every cross-row reduction (centroid member sums) is an exact
  *     integer aggregate — order-independent, identical in any engine;
  *   - centroid components are the correctly-rounded double quotient
  *     sum/count of those exact integers — IEEE-identical everywhere;
  *   - per-point distances fold (q_i - c_i)^2 left-to-right in fixed
  *     dimension order, so no floating-point result ever depends on row
  *     order or partitioning;
  *   - argmin ties break to the smallest cluster id, and the seed
  *     centroids are the k smallest-id vectors (deterministic init, the
  *     hash-seeded variant is one `orderBy` swap away).
  *
  * SCALE: the model (k x d integer sums + counts) is the ONLY driver-side
  * state — bounded by k*d, never by data (the q49 "driver-sized
  * centroids" contract; MLlib's KMeans holds the same state in
  * `collect()`ed form). Each iteration is one scan-speed assignment (the
  * centroid literals are folded into a codegen'd expression — no join, no
  * broadcast exchange) plus one map-side-combinable (cid, dim) sum. An
  * empty cluster keeps its previous centroid (documented Lloyd
  * degenerate-case convention).
  */
object Clustering {

  /** The shared Lloyd fit: quantized corpus view (localCheckpointed — read
    * every iteration and by the caller's final assignment) plus the final
    * centroid matrix. Both assignment surfaces ([[kMeansAssign]],
    * [[kMeansAssignRunnerUp]]) run the SAME fit, so their (cluster, dist)
    * columns are bit-identical. */
  /** Exact integer view of the corpus — (vid, q: array<long>),
    * localCheckpoint'd: float -> double is exact, the scaled round is
    * the single, shared quantization both engines agree on bit-for-bit.
    * All cross-row reductions in this module (and [[Pq]]) sum these
    * longs. */
  private[operators] def quantizedView(emb: DataFrame, idCol: String,
      vecCol: String, scale: Double): DataFrame =
    emb.select(col(idCol).cast("long").as("vid"),
      transform(col(vecCol), x => round(x.cast("double") * scale).cast("long"))
        .as("q"))
      .localCheckpoint() // read every iteration + final assignment

  private[operators] def fitQuantized(emb: DataFrame, k: Int, iters: Int,
      idCol: String, vecCol: String, scale: Double,
      farthestSeeds: Boolean = false,
      seedVectors: Option[Array[Array[Long]]] = None)
      : (DataFrame, Array[Array[Double]]) = {
    require(k > 0 && iters >= 0, s"k=$k iters=$iters must be positive")

    val q = quantizedView(emb, idCol, vecCol, scale)

    val dims = q.select(size(col("q"))).head().getInt(0)

    // seed: caller-supplied vectors (k-means|| picks), greedy
    // farthest-point (Gonzalez) when quality-seeded, or the k
    // smallest-id vectors (reproducibility-first default) — all as
    // (sum, count=1) states
    var sums: Array[Array[Long]] = seedVectors match {
      case Some(sv) =>
        require(sv.length == k, s"got ${sv.length} seed vectors, need $k")
        sv
      case None if farthestSeeds => farthestPointSeeds(q, k)
      case None => q.orderBy("vid").limit(k).select(col("q")).collect()
        .map(_.getSeq[Long](0).toArray)
    }
    var counts: Array[Long] = Array.fill(sums.length)(1L)

    def centroids(): Array[Array[Double]] =
      sums.zip(counts).map { case (s, c) => s.map(_.toDouble / c.toDouble) }

    /** cluster = argmin_j of the left-to-right (q_i - c_ji)^2 fold, ties
      * to the smallest j — the codegen'd [[graft.expressions
      * .NearestCentroid]] kernel. (The literal-unrolled
      * `array_min(array(struct...))` form generates O(k*dims) source per
      * row and falls out of whole-stage codegen past Janino's 64 KB
      * method limit; the kernel's runtime loop is constant-size.) */
    def assignCol(cents: Array[Array[Double]]): Column =
      graft.expressions.VectorFunctions.nearest_centroid(col("q"), cents)

    for (_ <- 1 to iters) {
      val assigned = q.select(col("vid"), col("q"),
        assignCol(centroids()).getField("cid").as("cid"))
      // one (cid, dim)-keyed exact integer aggregate — k*d result rows,
      // partial-aggregated map-side; the ONLY shuffle per round
      val upd = assigned
        .select(col("cid"), posexplode(col("q")).as(Seq("dim", "v")))
        .groupBy("cid", "dim").agg(sum("v").as("s"), count(lit(1)).as("c"))
        .collect()
      val ns = Array.fill(sums.length)(Array.fill(dims)(0L))
      val nc = Array.fill(sums.length)(0L)
      upd.foreach { r =>
        val cid = r.getLong(0).toInt
        ns(cid)(r.getInt(1)) = r.getLong(2)
        nc(cid) = r.getLong(3)
      }
      // empty cluster: keep the previous centroid state
      for (j <- sums.indices if nc(j) > 0L) { sums(j) = ns(j); counts(j) = nc(j) }
    }
    (q, centroids())
  }

  /** Greedy farthest-point (Gonzalez) seeding: seed 1 is the smallest-id
    * vector; each next seed is the vector FARTHEST from its nearest
    * already-chosen seed (ties to the smallest vid). Deterministic
    * quality seeding — no RNG, no transcendental, so the DuckDB oracle
    * replays it exactly; the k-means++ D² sampling this stands in for
    * needs a random draw that has no cross-engine convention
    * (DESIGN.md's exp()-boundary argument, same shape).
    *
    * SCALE: k-1 passes, each ONE scan-speed kernel pass (min distance to
    * the chosen matrix via [[graft.expressions.NearestCentroid]]) plus a
    * 1-row argmax collect — the BPE argmax shape. Driver state is the
    * chosen k x d matrix. For k in the hundreds prefer a k-means‖-style
    * oversampled variant (O(log n) passes); at the k this engine clusters
    * with (tens), k scans of a checkpointed 3-column projection are the
    * cheaper, simpler plan. */
  private def farthestPointSeeds(q: DataFrame, k: Int): Array[Array[Long]] = {
    var chosen = q.orderBy("vid").limit(1).select("q").collect()
      .map(_.getSeq[Long](0).toArray)
    while (chosen.length < k) {
      val cents = chosen.map(_.map(_.toDouble))
      val d = graft.expressions.VectorFunctions.nearest_centroid(col("q"), cents)
        .getField("d")
      val next = q.select(col("vid"), col("q"), d.as("d"))
        .orderBy(col("d").desc, col("vid")).limit(1)
        .select("q").collect()
      chosen = chosen :+ next.head.getSeq[Long](0).toArray
    }
    chosen
  }

  /** The final centroid matrix of the shared Lloyd fit, for callers
    * that need the MODEL rather than an assignment relation — e.g. the
    * streaming SemDeDup admission sink, whose reference partitioner is
    * fit offline once and then applied to every micro-batch (the IVF
    * "train on a historical corpus, serve forever" shape). Same
    * determinism contract as [[kMeansAssign]]; the fit's quantized
    * corpus view is released before returning (the caller keeps only
    * the k×d doubles). */
  def fitCentroids(emb: DataFrame, k: Int, iters: Int,
      idCol: String = "vec_id", vecCol: String = "embedding",
      scale: Double = 10000.0): Array[Array[Double]] = {
    val (q, cents) = fitQuantized(emb, k, iters, idCol, vecCol, scale)
    IterUtils.unpersistCheckpoint(q)
    cents
  }

  /** Assign every vector to one of `k` Lloyd clusters after `iters`
    * update rounds. Returns (idCol, cluster, dist) where `dist` is the
    * squared quantized-space distance to the final centroid, rounded to
    * 4 dp for presentation. */
  def kMeansAssign(emb: DataFrame, k: Int, iters: Int,
      idCol: String = "vec_id", vecCol: String = "embedding",
      scale: Double = 10000.0): DataFrame = {
    val (q, cents) = fitQuantized(emb, k, iters, idCol, vecCol, scale)
    // no presentation sort here: composed callers (cluster-scoped
    // SemDeDup, pipeline v3) consume the assignment as a relation, and
    // an operator-level orderBy would charge every composition a range
    // exchange it doesn't want. q129's register row sorts for display.
    val fin = graft.expressions.VectorFunctions.nearest_centroid(col("q"), cents)
    q.select(col("vid").as(idCol),
      fin.getField("cid").as("cluster"),
      round(fin.getField("d"), 4).as("dist"))
  }

  /** [[kMeansAssign]] with greedy farthest-point seeding instead of the
    * smallest-id default — quality-aware initial centroids (the Gonzalez
    * max-min sweep spreads seeds across the data's extent, where
    * smallest-id seeding can start k seeds inside one blob) with the same
    * Lloyd rounds, quantization, and determinism contract after seeding. */
  def kMeansAssignFarthest(emb: DataFrame, k: Int, iters: Int,
      idCol: String = "vec_id", vecCol: String = "embedding",
      scale: Double = 10000.0): DataFrame = {
    val (q, cents) = fitQuantized(emb, k, iters, idCol, vecCol, scale,
      farthestSeeds = true)
    val fin = graft.expressions.VectorFunctions.nearest_centroid(col("q"), cents)
    q.select(col("vid").as(idCol),
      fin.getField("cid").as("cluster"),
      round(fin.getField("d"), 4).as("dist"))
  }

  /** k-means‖ oversampled seeding (Bahmani et al. 2012, "Scalable
    * K-Means++"), made deterministic: `rounds` passes, each sampling
    * every point x independently with probability
    * min(1, ℓ·d²(x,C)/φ) where φ = Σ d² — the D² distribution
    * k-means++ draws SEQUENTIALLY, drawn here for the whole corpus at
    * once — then the ~ℓ·rounds candidates are weighted by how many
    * corpus points they'd absorb and reclustered down to k seeds.
    * This exists for exactly the regime [[graft.operators.Similarity
    * .scaledK]] creates: at k in the hundreds the Gonzalez sweep
    * ([[farthestPointSeeds]]) needs k−1 corpus passes, while k-means‖
    * needs `rounds` (constant) passes for the SAME quality class.
    *
    * Every randomness source is the portable 60-bit md5 hash (the
    * q66 sampling convention): u(x) = md5₆₀("kmp:r:" ++ vid) mod 2²⁰,
    * keep x iff u·φ < ℓ·2²⁰·d²(x). Distances to the candidate set run
    * on the [[graft.expressions.NearestCentroid]] kernel (candidates
    * are exact integer vectors, so d² is an exact integer-valued
    * double and φ sums exactly as decimal(38,0)); candidate order is
    * (round, vid); the final recluster is the paper's weighted
    * k-means++ step made deterministic — greedy weighted
    * farthest-point: seed 0 = heaviest candidate (ties smallest vid),
    * then argmax of weight·d²-to-chosen (ties smallest vid), k picks.
    * Result: one row per candidate — (idCol, round, weight,
    * seed_rank ∈ 0..k−1 | −1) — fully replayable in SQL.
    *
    * SCALE: `rounds` scan-speed kernel passes + one map-side-combined
    * φ aggregation + one 1-row-per-candidate weight aggregation;
    * driver state is the candidate set (≈ 1 + ℓ·rounds vectors) —
    * model-sized. Nothing corpus-sized is ever collected. */
  def kMeansParallelCandidates(emb: DataFrame, k: Int, ell: Int = 16,
      rounds: Int = 3, idCol: String = "vec_id", vecCol: String = "embedding",
      scale: Double = 10000.0): DataFrame =
    kMeansParallelCore(emb, k, ell, rounds, idCol, vecCol, scale)._1

  /** [[kMeansAssign]] seeded by the k-means‖ picks instead of the
    * smallest-id default: same Lloyd rounds, quantization, and
    * determinism contract after seeding — the constant-pass quality
    * seeding for the large-k regime [[graft.operators.Similarity
    * .scaledK]] produces. */
  def kMeansAssignParallelSeeded(emb: DataFrame, k: Int, iters: Int,
      ell: Int = 16, rounds: Int = 3,
      idCol: String = "vec_id", vecCol: String = "embedding",
      scale: Double = 10000.0): DataFrame = {
    val seeds = kMeansParallelCore(emb, k, ell, rounds, idCol, vecCol,
      scale)._2
    val (q, cents) = fitQuantized(emb, k, iters, idCol, vecCol, scale,
      seedVectors = Some(seeds))
    val fin = graft.expressions.VectorFunctions.nearest_centroid(col("q"), cents)
    q.select(col("vid").as(idCol),
      fin.getField("cid").as("cluster"),
      round(fin.getField("d"), 4).as("dist"))
  }

  private def kMeansParallelCore(emb: DataFrame, k: Int, ell: Int,
      rounds: Int, idCol: String, vecCol: String,
      scale: Double): (DataFrame, Array[Array[Long]]) = {
    require(k > 0 && ell > 0 && rounds > 0)
    val spark = emb.sparkSession
    import spark.implicits._
    val q = quantizedView(emb, idCol, vecCol, scale)

    // candidates in (round, vid) order; vectors stay integer-exact
    var cand = q.orderBy("vid").limit(1).select("vid", "q").collect()
      .map(r => (0, r.getLong(0), r.getSeq[Long](1).toArray)).toVector
    def cents(): Array[Array[Double]] =
      cand.map(_._3.map(_.toDouble)).toArray

    for (r <- 1 to rounds) {
      val d = graft.expressions.VectorFunctions
        .nearest_centroid(col("q"), cents()).getField("d")
      val scored = q.select(col("vid"), col("q"), d.as("d"))
      // φ as an exact decimal sum (d is an exact integer-valued double:
      // squared integer differences)
      val phi = scored.agg(sum(col("d").cast("decimal(38,0)")))
        .head().getDecimal(0).doubleValue()
      val u = pmod(graft.expressions.PortableHash.md5Hash60(
        concat(lit(s"kmp:$r:"), col("vid"))), lit(1048576L))
      val sampled = scored
        .where(u.cast("double") * lit(phi) <
          lit(ell * 1048576.0) * col("d"))
        .orderBy("vid")
        .select("vid", "q").collect()
        .map(x => (r, x.getLong(0), x.getSeq[Long](1).toArray))
      // expected ℓ draws/round; 64x is far past any non-adversarial tail
      require(cand.length + sampled.length <= 64 * ell * rounds,
        s"k-means|| oversampling drew ${sampled.length} in one round")
      cand = cand ++ sampled
    }

    // weight = corpus points each candidate would absorb (exact counts;
    // kernel ties -> smallest candidate index = (round, vid) order)
    val fin = graft.expressions.VectorFunctions
      .nearest_centroid(col("q"), cents()).getField("cid")
    val w = q.select(fin.as("ord")).groupBy("ord").agg(count(lit(1)).as("w"))
      .collect().map(r => r.getLong(0).toInt -> r.getLong(1)).toMap
    val weights = cand.indices.map(i => w.getOrElse(i, 0L))

    // deterministic weighted farthest-point recluster to k seed picks
    def d2(a: Array[Long], b: Array[Long]): Double = {
      var acc = 0.0; var i = 0
      while (i < a.length) {
        val t = a(i).toDouble - b(i).toDouble; acc += t * t; i += 1
      }
      acc
    }
    require(cand.length >= k,
      s"k-means|| drew ${cand.length} candidates < k=$k; raise ell/rounds")
    val seedRank = Array.fill(cand.length)(-1)
    val first = cand.indices.maxBy(i => (weights(i), -cand(i)._2))
    seedRank(first) = 0
    var chosen = List(first)
    for (pick <- 1 until k) {
      val next = cand.indices.filterNot(seedRank(_) >= 0)
        .maxBy { i =>
          val minD = chosen.map(c => d2(cand(i)._3, cand(c)._3)).min
          (weights(i).toDouble * minD, -cand(i)._2)
        }
      seedRank(next) = pick
      chosen ::= next
    }

    val out = cand.indices.map { i =>
      (cand(i)._2, cand(i)._1.toLong, weights(i), seedRank(i).toLong)
    }.toDF(idCol, "round", "weight", "seed_rank")
    val seeds = cand.indices.filter(seedRank(_) >= 0)
      .sortBy(seedRank(_)).map(cand(_)._3).toArray
    (out, seeds)
  }

  /** [[kMeansAssign]] plus the runner-up: (idCol, cluster, dist,
    * cluster2, dist2) where cluster2 is the second-nearest final centroid
    * — the "nearest competing cluster" hard-negative mining scopes its
    * candidates to. Same fit, same quantization, same tie rule; the
    * runner-up falls out of the SAME scan-speed kernel pass
    * ([[graft.expressions.NearestCentroid2]]), not a second assignment. */
  def kMeansAssignRunnerUp(emb: DataFrame, k: Int, iters: Int,
      idCol: String = "vec_id", vecCol: String = "embedding",
      scale: Double = 10000.0): DataFrame = {
    require(k >= 2, s"runner-up assignment needs k >= 2, got $k")
    val (q, cents) = fitQuantized(emb, k, iters, idCol, vecCol, scale)
    val fin = graft.expressions.VectorFunctions.nearest_centroid2(col("q"), cents)
    q.select(col("vid").as(idCol),
      fin.getField("cid").as("cluster"),
      round(fin.getField("d"), 4).as("dist"),
      fin.getField("cid2").as("cluster2"),
      round(fin.getField("d2"), 4).as("dist2"))
  }

  /** Squared-distance silhouette per cluster for a [[kMeansAssign]]
    * clustering: s(i) = (b−a)/max(a,b) with a = mean squared distance
    * to own-cluster co-members, b = the best other cluster's mean —
    * the clustering-quality scalar (near 1 = tight/separated, near 0 =
    * overlapping, negative = misassigned).
    *
    * The SQUARED-distance variant is deliberate: Σⱼ‖xᵢ−xⱼ‖² over a
    * cluster decomposes as n·‖xᵢ‖² − 2·xᵢ·S + Q from the cluster SUMS
    * (S, Q) — so the whole statistic is O(N·k) against k broadcast
    * rows instead of the O(N²) pair join the euclidean mean would
    * force. All sums are exact quantized integers (products bounded by
    * scale²·d·n — longs hold to ~10⁸ rows/cluster at the 1e-4 scale;
    * beyond that lift to decimal); the only doubles are the two
    * per-(point, cluster) divisions and the final fold. Singleton
    * clusters score 0 by the standard convention.
    *
    * SCALE: one assignment (the kMeansAssign contract), one
    * posexplode to (cluster × dims) exact sums, one scan-speed
    * zip_with pass against the k-row broadcast. */
  def silhouette(emb: DataFrame, k: Int, iters: Int,
      idCol: String = "vec_id", vecCol: String = "embedding",
      scale: Double = 10000.0): DataFrame = {
    val asg = kMeansAssign(emb, k, iters, idCol, vecCol, scale)
      .select(col(idCol).as("vid"), col("cluster"))
    val q = emb.select(col(idCol).cast("long").as("vid"),
      expr(s"transform($vecCol, x -> CAST(round(CAST(x AS DOUBLE) * $scale) AS LONG))")
        .as("q"))
    val pts = q.join(asg, "vid")
      .withColumn("n2", expr(
        "aggregate(transform(q, x -> x * x), CAST(0 AS LONG), (a, x) -> a + x)"))
      .localCheckpoint() // feeds cluster sums AND the scoring pass
    val dimSums = pts.select(col("cluster"), posexplode(col("q")).as(Seq("i", "v")))
      .groupBy("cluster", "i").agg(sum(col("v")).as("s"))
      .groupBy("cluster")
      .agg(expr("transform(sort_array(collect_list(struct(i, s))), x -> x.s)")
        .as("sv"))
    val stats = pts.groupBy("cluster")
      .agg(count(lit(1)).as("n"), sum(col("n2")).as("qq"))
      .join(dimSums, "cluster")
      .select(col("cluster").as("other"), col("n"), col("qq"), col("sv"))
    val dot = expr(
      "aggregate(zip_with(q, sv, (a, b) -> a * b), CAST(0 AS LONG), (a, x) -> a + x)")
    val ssd = col("n") * col("n2") - lit(2L) * dot + col("qq")
    val perC = pts.crossJoin(broadcast(stats)) // k-row bounded multiplier
      .select(col("vid"), col("cluster"), col("other"), col("n"),
        ssd.as("ssd"))
    val ab = perC.groupBy("vid", "cluster")
      .agg(max(when(col("other") === col("cluster") && col("n") > 1,
        col("ssd").cast("double") / (col("n") - 1L).cast("double"))).as("a"),
        min(when(col("other") =!= col("cluster"),
          col("ssd").cast("double") / col("n").cast("double"))).as("b"))
    val s = when(col("a").isNull, lit(0.0))
      .otherwise((col("b") - col("a")) / greatest(col("a"), col("b")))
    ab.select(col("cluster"), s.as("s"))
      .groupBy("cluster")
      .agg(count(lit(1)).as("n"),
        (round(avg(col("s")) * 1000000.0) / 1000000.0).as("mean_silhouette"))
      .orderBy("cluster")
  }

  /** DBSCAN (Ester et al. 1996) over the cosine-similarity eps-graph:
    * a point is CORE when it has >= `minPts` neighbors at cosine >=
    * `threshold` (self excluded — the convention is documented, not
    * hoped); clusters are the connected components of the core-core
    * graph labeled by min member id; non-core points with a core
    * neighbor become BORDER (assigned the min cluster among core
    * neighbors — deterministic where the textbook's "first reached" is
    * not); everything else is NOISE.
    *
    * SCALE: the eps-graph comes from [[Similarity.nearDupPairs]] —
    * SRP-bucketed candidates + exact verification, never corpus²; the
    * component pass is [[Dedup.duplicateClusters]] pointer-jumping;
    * everything else is node-keyed joins. An isolated core point (all
    * neighbors border) is its own cluster via the coalesce-self label. */
  def dbscan(emb: DataFrame, threshold: Double, minPts: Int,
      idCol: String = "vec_id", vecCol: String = "embedding"): DataFrame = {
    val pairs = Similarity.nearDupPairs(emb, threshold, idCol, vecCol,
        planes = Similarity.scaledPlanes(emb))
      .select(col("id_a"), col("id_b")).localCheckpoint()
    val sym = pairs.select(col("id_a").as("id"), col("id_b").as("nb"))
      .union(pairs.select(col("id_b").as("id"), col("id_a").as("nb")))
    val core = sym.groupBy("id").agg(count(lit(1)).as("deg"))
      .where(col("deg") >= minPts).select("id").localCheckpoint()
    val coreEdges = pairs
      .join(core.select(col("id").as("id_a")), Seq("id_a"), "left_semi")
      .join(core.select(col("id").as("id_b")), Seq("id_b"), "left_semi")
    val ccl = core
      .join(Dedup.duplicateClusters(coreEdges)
        .select(col("doc_id").as("id"), col("cluster")), Seq("id"), "left")
      .select(col("id"), coalesce(col("cluster"), col("id")).as("cluster"))
      .localCheckpoint() // feeds core labels + border election
    val border = sym
      .join(core.select(col("id")), Seq("id"), "left_anti")
      .join(ccl.select(col("id").as("nb"), col("cluster")), Seq("nb"))
      .groupBy("id").agg(min("cluster").as("cluster"))
    emb.select(col(idCol).as("id"))
      .join(ccl.select(col("id"), col("cluster").as("core_cl")), Seq("id"), "left")
      .join(border.select(col("id"), col("cluster").as("bord_cl")), Seq("id"), "left")
      .select(col("id").as(idCol),
        when(col("core_cl").isNotNull, "core")
          .when(col("bord_cl").isNotNull, "border")
          .otherwise("noise").as("role"),
        coalesce(col("core_cl"), col("bord_cl")).as("cluster"))
  }
}
