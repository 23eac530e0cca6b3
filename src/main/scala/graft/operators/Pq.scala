package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Product quantization ANN (Jégou, Douze & Schmid 2011, "Product
  * quantization for nearest neighbor search", IEEE TPAMI) — the missing
  * back half of the engine's Jégou pipeline: q160–q162 built the PCA
  * front-end, q49 the IVF coarse quantizer, q65 the two-stage
  * cheap-scan → exact-re-rank contract; this module supplies the PQ
  * codebooks and the asymmetric-distance (ADC) scan that complete
  * IVFADC.
  *
  * The d-dim space splits into `m` subspaces of d/m dims; each subspace
  * gets its own `kSub`-centroid Lloyd codebook, and a vector encodes as
  * m small codes (m bytes at kSub=256; kSub=16 here sizes the oracle).
  * A query never decodes the corpus: it builds an m×kSub lookup table
  * of exact subspace distances to ITS OWN sub-vectors once
  * (asymmetric — query side stays exact), and a vector's approximate
  * squared distance is the m-term LUT sum selected by its codes.
  *
  * DETERMINISM (the q129 quantized-Lloyd discipline, per subspace):
  * vectors quantize once to integers (round(x·10⁴)); every codebook
  * update is an exact integer (code, dim) sum with the count quotient
  * taken in doubles; distance folds run left-to-right in dimension
  * order; argmin ties break to the smallest code; seeds are the kSub
  * smallest-id sub-vectors; an empty cell keeps its centroid. Every
  * quantity — codebook, code, LUT entry, ADC sum — is therefore
  * bit-identical across partitionings AND across the DuckDB oracle,
  * which replays the same fit as m independent unrolled k-means chains
  * over sliced vectors (slice-then-quantize ≡ quantize-then-slice:
  * round is per-element).
  *
  * SCALE SHAPE: all m codebooks train SIMULTANEOUSLY — one assignment
  * pass (m codegen'd [[graft.expressions.NearestCentroid]] kernels over
  * slices of the checkpointed quantized corpus, zero joins) plus ONE
  * map-side-combined (code, dim) integer aggregation per Lloyd round —
  * kSub·d result rows, never m separate corpus scans. Driver state is
  * the m×kSub×(d/m) codebook — model-sized, the q129 contract. Encoding
  * and the ADC scan are pure per-row projections (codebooks and LUT
  * baked in as literals/references — no broadcast exchange, no
  * shuffle); the candidate cut is TakeOrderedAndProject, and only the
  * `rerank` survivors touch full vectors again.
  */
object Pq {

  /** m per-subspace codebooks fit by `iters` simultaneous Lloyd rounds
    * over the quantized corpus `q` (vid, q: array<long> — the
    * [[Clustering.fitQuantized]] view). Returns books(s)(c)(i): subspace
    * s, code c, sub-dim i. */
  private[operators] def fitCodebooks(q: DataFrame, d: Int, m: Int,
      kSub: Int, iters: Int): Array[Array[Array[Double]]] = {
    require(d % m == 0, s"d=$d not divisible by m=$m subspaces")
    val subDim = d / m

    // seeds: the kSub smallest-id vectors, sliced per subspace — exactly
    // the per-subspace instantiation of the q129 seed rule
    val seedRows = q.orderBy("vid").limit(kSub).select("q").collect()
      .map(_.getSeq[Long](0).toArray)
    require(seedRows.length == kSub,
      s"corpus has ${seedRows.length} vectors < kSub=$kSub codewords")
    var sums: Array[Array[Array[Long]]] = Array.tabulate(m, kSub) {
      (s, c) => seedRows(c).slice(s * subDim, (s + 1) * subDim)
    }
    var counts: Array[Array[Long]] = Array.fill(m, kSub)(1L)

    def books(): Array[Array[Array[Double]]] = Array.tabulate(m, kSub) {
      (s, c) => sums(s)(c).map(_.toDouble / counts(s)(c).toDouble)
    }

    for (_ <- 1 to iters) {
      val bs = books()
      // all m sub-assignments in one projection; the (code, dim) sums in
      // ONE shuffle of kSub*d partial rows — the only cluster work/round
      val upd = q
        .select(codesCol(bs, subDim).as("codes"), posexplode(col("q")))
        .select(col("codes"), (col("pos") / subDim).cast("int").as("s"),
          col("pos"), col("col").as("v"))
        .withColumn("code", element_at(col("codes"), col("s") + 1))
        .groupBy("s", "code", "pos")
        .agg(sum("v").as("sv"), count(lit(1)).as("c"))
        .collect()
      val ns = Array.fill(m, kSub)(Array.fill(subDim)(0L))
      val nc = Array.fill(m, kSub)(0L)
      upd.foreach { r =>
        val s = r.getInt(0); val c = r.getInt(1).toInt
        ns(s)(c)(r.getInt(2) - s * subDim) = r.getLong(3)
        nc(s)(c) = r.getLong(4)
      }
      for (s <- 0 until m; c <- 0 until kSub if nc(s)(c) > 0L) {
        sums(s)(c) = ns(s)(c); counts(s)(c) = nc(s)(c)
      }
    }
    books()
  }

  /** The m PQ codes of a quantized vector as array<int>: per subspace,
    * the nearest-codeword id from the codegen'd kernel over the slice —
    * one shuffle-free projection. */
  private def codesCol(books: Array[Array[Array[Double]]],
      subDim: Int): Column =
    array(books.indices.map { s =>
      graft.expressions.VectorFunctions
        .nearest_centroid(slice(col("q"), s * subDim + 1, subDim), books(s))
        .getField("cid").cast("int")
    }: _*)

  /** PQ-encode the corpus: (idCol, codes array<int>) under freshly-fit
    * codebooks — the register surface proving codebook + codes
    * bit-exact against the oracle's unrolled per-subspace k-means. */
  def pqCodes(emb: DataFrame, m: Int = 8, kSub: Int = 16, iters: Int = 2,
      idCol: String = "vec_id", vecCol: String = "embedding"): DataFrame = {
    val q = Clustering.quantizedView(emb, idCol, vecCol, 10000.0)
    val d = q.select(size(col("q"))).head().getInt(0)
    val books = fitCodebooks(q, d, m, kSub, iters)
    q.select(col("vid").as(idCol), codesCol(books, d / m).as("codes"))
  }

  /** IVFADC search: coarse IVF gate (probe the `nProbe` cells nearest
    * the query), ADC scan (LUT sum over the m codes — approximate
    * squared L2 in quantized space), keep the best `rerank`, then exact
    * cosine re-rank to k (the q65 two-stage contract). Codes here are
    * raw-vector PQ sharing one codebook across cells (the paper's
    * residual refinement per cell is a direct composition but would
    * obscure the oracle); recall vs brute force is spec-checked. */
  def ivfPqTopK(emb: DataFrame, queryId: Long, k: Int,
      nCells: Int = 8, nProbe: Int = 3, m: Int = 8, kSub: Int = 16,
      iters: Int = 2, rerank: Int = 50,
      idCol: String = "vec_id", vecCol: String = "embedding"): DataFrame = {
    // ONE quantized corpus view serves coarse fit, PQ fit, and encoding
    val (q, coarse) = Clustering.fitQuantized(emb, nCells, iters, idCol,
      vecCol, 10000.0)
    val d = q.select(size(col("q"))).head().getInt(0)
    val subDim = d / m
    val books = fitCodebooks(q, d, m, kSub, iters)

    val qq = q.where(col("vid") === queryId).select("q").head()
      .getSeq[Long](0).toArray

    // driver-side model work (nCells + m*kSub rows): probe-cell ranking
    // and the ADC lookup table, both the kernel's left-to-right fold
    def sqDist(a: Array[Long], c: Array[Double], off: Int): Double = {
      var acc = 0.0; var i = 0
      while (i < c.length) {
        val t = a(off + i).toDouble - c(i); acc += t * t; i += 1
      }
      acc
    }
    val probed = coarse.zipWithIndex
      .map { case (c, j) => (j, sqDist(qq, c, 0)) }
      .sortBy { case (j, dd) => (dd, j) }.take(nProbe).map(_._1)
    val lut: Array[Array[Double]] = Array.tabulate(m, kSub) {
      (s, c) => sqDist(qq, books(s)(c), s * subDim)
    }

    // scan-speed candidate pass: cell + codes + ADC sum in one codegen'd
    // projection, cut by TakeOrderedAndProject — no shuffle before the cut
    val adc = (0 until m).map { s =>
      element_at(array(lut(s).map(lit): _*), element_at(col("codes"), s + 1) + 1)
    }.reduce(_ + _)
    val cand = q
      .select(col("vid"),
        graft.expressions.VectorFunctions.nearest_centroid(col("q"), coarse)
          .getField("cid").as("cell"),
        codesCol(books, subDim).as("codes"))
      .where(col("cell").isin(probed.map(_.toLong): _*) &&
        col("vid") =!= queryId)
      .select(col("vid"), adc.as("adist"))
      .orderBy(col("adist").asc, col("vid")).limit(rerank)

    val qv = broadcast(emb.where(col(idCol) === queryId)
      .select(col(vecCol).cast("array<double>").as("qv")))
    cand.join(emb.select(col(idCol).as("vid"), col(vecCol)), Seq("vid"))
      .crossJoin(qv)
      .select(col("vid").as(idCol),
        (round(Similarity.cosine(col(vecCol), col("qv")) * 1000000.0)
          / 1000000.0).as("cos"))
      .orderBy(col("cos").desc, col(idCol))
      .limit(k)
  }
}
