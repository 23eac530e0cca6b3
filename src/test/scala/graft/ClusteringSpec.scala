package graft

import graft.operators.Clustering
import org.apache.spark.sql.functions._

class ClusteringSpec extends GraftSpec {
  import spark.implicits._

  private def toDf(rows: Seq[(Long, Seq[Float])]) =
    rows.toDF("vec_id", "embedding")

  test("kMeans separates two well-separated blobs exactly") {
    // blob A around (0, 0), blob B around (100, 100); seeds are the two
    // smallest ids — one from each blob by construction
    val rows = Seq(
      0L -> Seq(0.1f, 0.2f), 1L -> Seq(100.3f, 99.9f),
      2L -> Seq(0.3f, -0.1f), 3L -> Seq(0.0f, 0.4f),
      4L -> Seq(99.7f, 100.2f), 5L -> Seq(100.1f, 100.0f),
      6L -> Seq(-0.2f, 0.1f), 7L -> Seq(99.9f, 99.8f))
    val out = Clustering.kMeansAssign(toDf(rows), k = 2, iters = 3)
      .select("vec_id", "cluster").as[(Long, Long)].collect().toMap
    assert(Set(0L, 2L, 3L, 6L).forall(out(_) == 0L))
    assert(Set(1L, 4L, 5L, 7L).forall(out(_) == 1L))
  }

  test("nearest_centroid rejects non-bigint arrays at analysis time") {
    // the kernel reads elements with ArrayData.getLong — applied to
    // array<double> it would reinterpret bytes into garbage assignments,
    // so misuse must fail analysis instead
    val df = Seq(Seq(1.0, 2.0)).toDF("v")
    val ex = intercept[org.apache.spark.sql.AnalysisException] {
      df.select(graft.expressions.VectorFunctions
        .nearest_centroid(col("v"), Array(Array(0.0, 0.0)))).collect()
    }
    assert(ex.getMessage.contains("array<bigint>"), ex.getMessage)
  }

  test("kMeans assignment is invariant to input partitioning") {
    val emb = spark.read.parquet(s"$sf001/embeddings.parquet")
    def run(df: org.apache.spark.sql.DataFrame) =
      Clustering.kMeansAssign(df, k = 4, iters = 2)
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
        .sortBy(_._1)
    assert(run(emb).sameElements(run(emb.repartition(13))))
  }

  test("empty cluster keeps its previous centroid instead of crashing") {
    // ids 0 and 1 share a vector: the tie-break sends both to cluster 0,
    // cluster 1 goes empty and must retain its seed centroid
    val rows = Seq(
      0L -> Seq(1.0f, 1.0f), 1L -> Seq(1.0f, 1.0f),
      2L -> Seq(50.0f, 50.0f), 3L -> Seq(1.2f, 0.8f))
    val out = Clustering.kMeansAssign(toDf(rows), k = 2, iters = 3)
      .select("vec_id", "cluster").as[(Long, Long)].collect().toMap
    // identical vectors always land in the same cluster, every id is
    // legal, and the run completed despite cluster 1 emptying in round 1
    // (its retained (1,1) centroid can win members back later — that is
    // the retention convention working, not an error)
    assert(out(0L) == out(1L))
    assert(out.values.forall(c => c == 0L || c == 1L))
  }

  test("clustered semdedup: planted within-cluster dups dropped, min id kept") {
    import graft.operators.Similarity
    // two far-apart blobs; ids 2,3 duplicate id 0's vector (same blob),
    // id 11 duplicates id 10's. Seeds (two smallest ids) split the blobs.
    val rows = Seq(
      0L -> Seq(1.0f, 0.0f, 0.0f), 10L -> Seq(0.0f, 100.0f, 0.0f),
      2L -> Seq(1.0f, 0.001f, 0.0f), 3L -> Seq(0.999f, 0.0f, 0.001f),
      5L -> Seq(0.0f, 0.0f, 1.0f), // orthogonal: no dup anywhere
      11L -> Seq(0.001f, 100.0f, 0.0f))
      .toDF("vec_id", "embedding")
    val kept = Similarity
      .semanticDedupClustered(rows, threshold = 0.99, k = 2, iters = 2)
      .select("vec_id").as[Long].collect().toSet
    assert(!kept.contains(2L) && !kept.contains(3L),
      s"dups of 0 must drop: $kept")
    assert(!kept.contains(11L), s"dup of 10 must drop: $kept")
    assert(kept.contains(0L) && kept.contains(10L) && kept.contains(5L),
      s"cluster minima and singletons survive: $kept")
  }

  test("runner-up assignment: agrees with kMeansAssign, matches brute-force rank 2") {
    val emb = spark.read.parquet(s"$sf001/embeddings.parquet")
    val base = Clustering.kMeansAssign(emb, k = 4, iters = 2)
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getDouble(2))).toMap
    val full = Clustering.kMeansAssignRunnerUp(emb, k = 4, iters = 2)
      .collect().map(r => r.getLong(0) ->
        (r.getLong(1), r.getDouble(2), r.getLong(3), r.getDouble(4))).toMap
    assert(full.keySet == base.keySet)
    full.foreach { case (vid, (c1, d1, c2, d2)) =>
      // best slot bit-identical to the single-best kernel
      assert((c1, d1) == base(vid), s"vid=$vid best slot drifted")
      // runner-up is a DIFFERENT cluster at >= the best distance
      assert(c2 != c1, s"vid=$vid runner-up == best")
      assert(d2 >= d1, s"vid=$vid d2=$d2 < d=$d1")
    }
    // brute-force rank-2 check on a tiny fixture with known geometry:
    // anchors near (0,0) have best=0, runner-up=1 ((10,0) beats (0,20))
    val rows = Seq(
      0L -> Seq(0.0f, 0.0f), 1L -> Seq(10.0f, 0.0f), 2L -> Seq(0.0f, 20.0f),
      3L -> Seq(1.0f, 0.0f), 4L -> Seq(9.0f, 0.0f))
    val out = Clustering.kMeansAssignRunnerUp(toDf(rows), k = 3, iters = 0)
      .select("vec_id", "cluster", "cluster2")
      .as[(Long, Long, Long)].collect().map(t => t._1 -> (t._2, t._3)).toMap
    // iters=0 keeps the seed centroids (vectors 0/1/2) — assignments are
    // hand-checkable: 3 is nearest seed0 then seed1; 4 nearest seed1 then seed0
    assert(out(3L) == (0L, 1L), s"got ${out(3L)}")
    assert(out(4L) == (1L, 0L), s"got ${out(4L)}")
  }

  test("farthest-point seeding spreads seeds across blobs where smallest-id cannot") {
    // the three smallest ids all live in blob A: smallest-id seeding with
    // iters=0 starts (and stays) inside one blob, farthest-point jumps to
    // blob B for its second seed
    val rows = Seq(
      0L -> Seq(0.1f, 0.2f), 1L -> Seq(0.3f, -0.1f), 2L -> Seq(-0.2f, 0.1f),
      3L -> Seq(100.0f, 100.1f), 4L -> Seq(99.8f, 100.2f))
    val far = Clustering.kMeansAssignFarthest(toDf(rows), k = 2, iters = 0)
      .select("vec_id", "cluster").as[(Long, Long)].collect().toMap
    assert(Set(0L, 1L, 2L).map(far).size == 1, s"blob A split: $far")
    assert(Set(3L, 4L).map(far).size == 1, s"blob B split: $far")
    assert(far(0L) != far(3L), s"blobs merged: $far")
    // smallest-id seeding with iters=0 seeds 0 and 1 — both in blob A —
    // and B's points report a huge dist; farthest seeding's max in-cluster
    // dist is blob-radius-sized. The quality gap is the point of the op.
    val naive = Clustering.kMeansAssign(toDf(rows), k = 2, iters = 0)
      .agg(max("dist")).head().getDouble(0)
    val seeded = Clustering.kMeansAssignFarthest(toDf(rows), k = 2, iters = 0)
      .agg(max("dist")).head().getDouble(0)
    assert(seeded < naive / 100.0, s"seeded=$seeded naive=$naive")
    // with Lloyd rounds on top, the seeded variant still separates exactly
    val conv = Clustering.kMeansAssignFarthest(toDf(rows), k = 2, iters = 3)
      .select("vec_id", "cluster").as[(Long, Long)].collect().toMap
    assert(Set(0L, 1L, 2L).map(conv).size == 1 && conv(0L) != conv(3L))
  }

  test("clustered semdedup: maxCluster excises a degenerate hot cluster") {
    import graft.operators.Similarity
    // 30 identical vectors (encoder-failure mass) + 2 honest dups
    val degen = (100L until 130L).map(i => i -> Seq(5.0f, 5.0f, 5.0f))
    val honest = Seq(0L -> Seq(1.0f, 0.0f, 0.0f), 1L -> Seq(1.0f, 0.0001f, 0.0f))
    val df = (honest ++ degen).toDF("vec_id", "embedding")
    val kept = Similarity.semanticDedupClustered(df, threshold = 0.99,
        k = 2, iters = 2, maxCluster = Some(10L))
      .select("vec_id").as[Long].collect().toSet
    // the degenerate cluster is excised from candidate generation: all
    // 30 survive (nothing pairs), while the honest pair still dedups
    assert((100L until 130L).forall(kept.contains), s"guarded mass survives: $kept")
    assert(kept.contains(0L) && !kept.contains(1L), s"honest dup still drops: $kept")
  }

  test("k-means|| candidates: deterministic across partitionings, k seeds ranked") {
    val emb = spark.read.parquet(s"$sf001/embeddings.parquet")
    def rows(df: org.apache.spark.sql.DataFrame) =
      Clustering.kMeansParallelCandidates(df, k = 8, ell = 16, rounds = 3)
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
          r.getLong(3))).sortBy(_._1).toSeq
    val a = rows(emb.repartition(1))
    val b = rows(emb.repartition(13))
    assert(a == b, "candidate set must be partition-invariant")
    // exactly k picked seeds, ranks 0..k-1, each a real candidate
    val ranks = a.filter(_._4 >= 0).map(_._4).sorted
    assert(ranks == (0L until 8L), s"seed ranks: $ranks")
    // weights cover the corpus: every corpus point absorbed by someone
    assert(a.map(_._3).sum == emb.count())
  }

  test("k-means|| seeding spreads across planted blobs where smallest-id seeding cannot") {
    // 4 tight blobs; ids ordered so the 4 smallest-id points all sit in
    // blob 0 — smallest-id seeding starts every seed in one blob, while
    // the D^2-sampled + weighted-farthest recluster must hit all 4
    val pts = (0 until 400).map { i =>
      val blob = if (i < 4) 0 else i % 4
      val base = Seq(0.0f, 40.0f, -40.0f, 80.0f)(blob)
      (i.toLong, Seq(base + (i % 7) * 0.01f, base - (i % 5) * 0.01f))
    }
    val df = pts.toDF("vec_id", "embedding")
    val asg = Clustering.kMeansAssignParallelSeeded(df, k = 4, iters = 2,
      ell = 8, rounds = 3)
      .select("vec_id", "cluster").as[(Long, Long)].collect().toMap
    // every blob ends in its own cluster: 4 distinct labels, and blob
    // membership is consistent
    val byBlob = pts.groupBy { case (id, _) =>
      if (id < 4) 0 else (id % 4).toInt }
      .map { case (b, ps) => b -> ps.map(p => asg(p._1)).toSet }
    assert(byBlob.values.forall(_.size == 1), s"blob split: $byBlob")
    assert(byBlob.values.flatten.toSet.size == 4, s"blobs merged: $byBlob")
  }
}
