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
      farthestSeeds: Boolean = false): (DataFrame, Array[Array[Double]]) = {
    require(k > 0 && iters >= 0, s"k=$k iters=$iters must be positive")

    val q = quantizedView(emb, idCol, vecCol, scale)

    val dims = q.select(size(col("q"))).head().getInt(0)

    // seed: the k smallest-id vectors (reproducibility-first default), or
    // greedy farthest-point (Gonzalez) when quality-seeded — both as
    // (sum, count=1) states
    var sums: Array[Array[Long]] =
      if (farthestSeeds) farthestPointSeeds(q, k)
      else q.orderBy("vid").limit(k).select(col("q")).collect()
        .map(_.getSeq[Long](0).toArray)
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
}
