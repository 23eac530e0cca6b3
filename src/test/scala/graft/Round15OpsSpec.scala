package graft

import graft.operators.{Clustering, GraphOps, Similarity}
import org.apache.spark.sql.functions._

/** Round-15 operators: the k-core convergence trajectory's fixpoint
  * contract and the streaming SemDeDup admission sink's replay
  * idempotence. */
class Round15OpsSpec extends GraftSpec {
  import spark.implicits._

  test("kCoreTrajectory: hand-computable path graph, early exit fills the fixpoint tail") {
    // path a-b-c, k=2: only b has degree 2, but after peeling a and c,
    // b's surviving degree is 0 — the 2-core is empty, reached at round 2
    val edges = Seq((1L, 2L), (2L, 3L)).toDF("src", "dst")
    val got = GraphOps.kCoreTrajectory(edges, k = 2, maxRounds = 5)
      .orderBy("round")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getBoolean(2)))
    assert(got.toSeq == Seq(
      (1L, 1L, false), // {b} survives the first degree cut
      (2L, 0L, false), // b loses both neighbors -> empty
      (3L, 0L, true),  // fixpoint detected (0 == 0)
      (4L, 0L, true), (5L, 0L, true))) // tail emitted, not run
  }

  test("kCoreTrajectory: final survivors agree with kCorePeel's core on the trade graph") {
    val edges = spark.read.parquet(s"$sf0001/lineitem.parquet")
      .join(spark.read.parquet(s"$sf0001/orders.parquet"),
        col("l_orderkey") === col("o_orderkey"))
      .select(col("o_custkey").as("src"),
        (lit(1000000L) + col("l_suppkey")).as("dst"))
    val traj = GraphOps.kCoreTrajectory(edges, k = 3, maxRounds = 8)
      .orderBy("round").collect()
    val coreNodes = GraphOps.kCorePeel(edges, k = 3, rounds = 8).count()
    assert(traj.last.getLong(1) == coreNodes,
      "round-8 survivors must equal the fixed-8-round core size")
    // survivor counts never increase, and converged is sticky once true
    val counts = traj.map(_.getLong(1)).toSeq
    assert(counts == counts.sorted.reverse, s"non-monotone: $counts")
    val flags = traj.map(_.getBoolean(2)).toSeq
    assert(!flags.zip(flags.tail).exists { case (a, b) => a && !b },
      s"converged flag must be sticky: $flags")
    // the flag is the count test, literally
    traj.sliding(2).foreach { w =>
      if (w.length == 2)
        assert(w(1).getBoolean(2) == (w(1).getLong(1) == w(0).getLong(1)))
    }
  }

  test("streamingSemDedupIngest: fresh-checkpoint replay of landed files is a no-op") {
    val emb = spark.read.parquet(s"$sf0001/embeddings.parquet")
    val cents = Clustering.fitCentroids(emb, k = Similarity.scaledK(emb),
      iters = 2)
    val root = java.nio.file.Files.createTempDirectory("graft-r15-sem")
    val landing = root.resolve("landing")
    java.nio.file.Files.createDirectories(landing)
    val target = root.resolve("accepted").toString
    def land(df: org.apache.spark.sql.DataFrame, tag: String): Unit = {
      val tmp = root.resolve(s"stage_$tag")
      df.coalesce(1).write.parquet(tmp.toString)
      val part = new java.io.File(tmp.toString).listFiles()
        .filter(f => f.getName.startsWith("part-") &&
          f.getName.endsWith(".parquet")).head
      java.nio.file.Files.copy(part.toPath, landing.resolve(s"$tag.parquet"))
      ()
    }
    def stream = spark.readStream.schema(emb.schema).parquet(landing.toString)
    land(emb.where(col("vec_id") % 2 === 0), "b1")
    graft.streaming.EventsStream.streamingSemDedupIngest(spark, stream, 0.8,
      cents, target, root.resolve("ckpt1").toString)
    land(emb.where(col("vec_id") % 2 === 1), "b2")
    graft.streaming.EventsStream.streamingSemDedupIngest(spark, stream, 0.8,
      cents, target, root.resolve("ckpt1").toString)
    val after2 = spark.read.parquet(target)
      .select("did", "batch_id").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(after2.nonEmpty)
    // a FRESH checkpoint replays every landed file as one batch; the
    // id anti-join must make that replay append nothing
    graft.streaming.EventsStream.streamingSemDedupIngest(spark, stream, 0.8,
      cents, target, root.resolve("ckpt2").toString)
    val after3 = spark.read.parquet(target)
      .select("did", "batch_id").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(after3 == after2, "replay must not re-admit or re-batch rows")
  }

  test("labelPropagationTrajectory: hand-computed triangle converges, tail emitted verbatim") {
    // triangle 1-2-3 (unit weights): r1 all three adopt a neighbor label
    // (ties to smaller) -> changed 3; r2 only node 1 moves back to label
    // 1 -> changed 1; r3 nothing moves -> fixpoint; r4/r5 are the tail
    val edges = Seq((1L, 2L, 1L), (2L, 3L, 1L), (1L, 3L, 1L))
      .toDF("src", "dst", "w")
    val got = graft.operators.GraphOps
      .labelPropagationTrajectory(edges, maxRounds = 5)
      .orderBy("round").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getBoolean(2))).toSeq
    assert(got == Seq((1L, 3L, false), (2L, 1L, false), (3L, 0L, true),
      (4L, 0L, true), (5L, 0L, true)))
  }

  test("labelPropagationTrajectory: a bipartite 2-cycle honestly never converges") {
    // single edge 1-2: synchronous LP swaps the two labels every round —
    // the oscillation a pinned-round caller can never see
    val edges = Seq((1L, 2L, 1L)).toDF("src", "dst", "w")
    val got = graft.operators.GraphOps
      .labelPropagationTrajectory(edges, maxRounds = 4)
      .orderBy("round").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getBoolean(2))).toSeq
    assert(got == Seq((1L, 2L, false), (2L, 2L, false), (3L, 2L, false),
      (4L, 2L, false)))
  }

  test("incrementalComponents: cross-batch merge relabels history, final == batch twin, replay is a no-op") {
    import graft.operators.{Dedup, Incremental}
    val root = java.nio.file.Files.createTempDirectory("graft-r15-cc")
      .resolve("state").toString
    def batch(pairs: (Long, Long)*): org.apache.spark.sql.DataFrame =
      pairs.toSeq.toDF("id_a", "id_b")
    def state(): Seq[(Long, Long)] = Incremental.readComponents(spark, root)
      .select("id", "cluster").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSeq.sorted
    // wave 1: two separate components {1,2} and {5,6}
    Incremental.incrementalComponents(spark, root, batch((1L, 2L), (5L, 6L)))
    assert(state() == Seq((1L, 1L), (2L, 1L), (5L, 5L), (6L, 5L)))
    // wave 2: the bridge 2-5 merges them — node 6 (NOT in the batch)
    // must be relabeled through the broadcast remap
    Incremental.incrementalComponents(spark, root, batch((2L, 5L)))
    assert(state() == Seq((1L, 1L), (2L, 1L), (5L, 1L), (6L, 1L)))
    // wave 3: a fresh component {7,8} plus 6-9 growing the merged one
    Incremental.incrementalComponents(spark, root, batch((7L, 8L), (6L, 9L)))
    val after3 = state()
    assert(after3 == Seq((1L, 1L), (2L, 1L), (5L, 1L), (6L, 1L),
      (7L, 7L), (8L, 7L), (9L, 1L)))
    // the sidecar equals the from-scratch batch CC over the union
    val twin = Dedup.duplicateClusters(
        batch((1L, 2L), (5L, 6L), (2L, 5L), (7L, 8L), (6L, 9L)))
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSeq.sorted
    assert(after3 == twin)
    // at-least-once replay of wave 3: quotient is empty, nothing changes
    Incremental.incrementalComponents(spark, root, batch((7L, 8L), (6L, 9L)))
    assert(state() == after3)
  }

  test("incrementalComponents: an all-self-pair first batch does not poison the sidecar") {
    import graft.operators.Incremental
    val root = java.nio.file.Files.createTempDirectory("graft-r15-ccs")
      .resolve("state").toString
    // self-pairs filter to zero edges: the state dir must NOT be created
    // (a zero-row partitioned write leaves only _SUCCESS, and the next
    // batch's exists-read would die on schema inference)
    Incremental.incrementalComponents(spark, root,
      Seq((3L, 3L)).toDF("id_a", "id_b"))
    assert(!new java.io.File(root).exists(),
      "empty first batch must leave the sidecar uninitialized")
    Incremental.incrementalComponents(spark, root,
      Seq((1L, 2L)).toDF("id_a", "id_b"))
    val state = Incremental.readComponents(spark, root)
      .select("id", "cluster").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSeq.sorted
    assert(state == Seq((1L, 1L), (2L, 1L)))
  }

  test("DistributedRank.prefixSum treats null values as 0, like a window sum's null skipping") {
    import graft.operators.DistributedRank
    val df = Seq((1L, Option(2L)), (2L, Option.empty[Long]), (3L, Option(5L)))
      .toDF("v", "w")
    val got = DistributedRank.prefixSum(df, Nil, Seq(col("v")),
        Seq("w" -> "cum"), inclusive = true, totals = Seq("w" -> "tot"))
      .orderBy("v").collect()
      .map(r => (r.getLong(0), r.getLong(2), r.getLong(3))).toSeq
    // the null row still receives the running prefix (2), contributes 0
    assert(got == Seq((1L, 2L, 7L), (2L, 2L, 7L), (3L, 7L, 7L)))
  }

  test("incrementalComponents over corpus waves equals duplicateClusters on the full pair set") {
    import graft.operators.{Dedup, Incremental}
    val docs = spark.read.parquet(s"$sf0001/documents.parquet")
    val pairs = Dedup.shingleJaccardPairs(docs, 0.5)
      .select(col("id_a"), col("id_b")).localCheckpoint()
    val n = docs.agg(max(col("doc_id"))).head.getLong(0)
    val hi = greatest(col("id_a"), col("id_b"))
    val root = java.nio.file.Files.createTempDirectory("graft-r15-ccw")
      .resolve("state").toString
    Seq(hi <= lit(n / 3), hi > lit(n / 3) && hi <= lit(2 * n / 3),
        hi > lit(2 * n / 3))
      .foreach(w => Incremental.incrementalComponents(spark, root,
        pairs.where(w)))
    val inc = Incremental.readComponents(spark, root)
      .select("id", "cluster").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    val batchTwin = Dedup.duplicateClusters(pairs).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(inc == batchTwin)
  }

  test("streamingComponentsIngest: fresh-checkpoint replay of landed pair files is a no-op") {
    import graft.operators.Dedup
    val root = java.nio.file.Files.createTempDirectory("graft-r15-scc")
    val landing = root.resolve("landing")
    java.nio.file.Files.createDirectories(landing)
    val state = root.resolve("state").toString
    def land(pairs: Seq[(Long, Long)], tag: String): Unit = {
      val tmp = root.resolve(s"stage_$tag")
      pairs.toDF("id_a", "id_b").coalesce(1).write.parquet(tmp.toString)
      val part = new java.io.File(tmp.toString).listFiles()
        .filter(f => f.getName.startsWith("part-") &&
          f.getName.endsWith(".parquet")).head
      java.nio.file.Files.copy(part.toPath, landing.resolve(s"$tag.parquet"))
      ()
    }
    val schema = Seq((1L, 2L)).toDF("id_a", "id_b").schema
    def stream = spark.readStream.schema(schema).parquet(landing.toString)
    land(Seq((1L, 2L), (5L, 6L)), "w1")
    graft.streaming.EventsStream.streamingComponentsIngest(spark, stream,
      state, root.resolve("ckpt1").toString)
    land(Seq((2L, 5L)), "w2")
    graft.streaming.EventsStream.streamingComponentsIngest(spark, stream,
      state, root.resolve("ckpt1").toString)
    def labels(): Seq[(Long, Long)] =
      graft.operators.Incremental.readComponents(spark, state)
        .select("id", "cluster").collect()
        .map(r => (r.getLong(0), r.getLong(1))).toSeq.sorted
    val after2 = labels()
    assert(after2 == Seq((1L, 1L), (2L, 1L), (5L, 1L), (6L, 1L)),
      "cross-batch merge must relabel the sidecar through the stream")
    val twin = Dedup.duplicateClusters(
        Seq((1L, 2L), (5L, 6L), (2L, 5L)).toDF("id_a", "id_b"))
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSeq.sorted
    assert(after2 == twin)
    // a FRESH checkpoint replays every landed file as one batch; the
    // operator's quotient-empty contract must make it a no-op
    graft.streaming.EventsStream.streamingComponentsIngest(spark, stream,
      state, root.resolve("ckpt2").toString)
    assert(labels() == after2, "replay must not change any label")
  }

  test("streamingSemDedupIngest admits exactly the cluster-scoped batch twin") {
    val emb = spark.read.parquet(s"$sf0001/embeddings.parquet")
    val k = Similarity.scaledK(emb)
    val cents = Clustering.fitCentroids(emb, k = k, iters = 2)
    val root = java.nio.file.Files.createTempDirectory("graft-r15-twin")
    val landing = root.resolve("landing")
    java.nio.file.Files.createDirectories(landing)
    val target = root.resolve("accepted").toString
    val tmp = root.resolve("stage")
    emb.coalesce(1).write.parquet(tmp.toString)
    val part = new java.io.File(tmp.toString).listFiles()
      .filter(f => f.getName.startsWith("part-") &&
        f.getName.endsWith(".parquet")).head
    java.nio.file.Files.copy(part.toPath, landing.resolve("all.parquet"))
    graft.streaming.EventsStream.streamingSemDedupIngest(spark,
      spark.readStream.schema(emb.schema).parquet(landing.toString), 0.8,
      cents, target, root.resolve("ckpt").toString)
    val got = spark.read.parquet(target).select("did").collect()
      .map(_.getLong(0)).toSet
    // one-batch ingest == the conservative smaller-id twin under the
    // SAME reference assignment (the q136 oracle's admission rule; the
    // q464 register row pins the cross-engine contract — this spec pins
    // the engine-internal equivalence)
    val vecs = emb.select(col("vec_id").as("did"),
      col("embedding").cast("array<double>").as("v"))
    val assign = Clustering.kMeansAssign(emb, k = k, iters = 2)
      .select(col("vec_id").as("did"), col("cluster"))
    val av = vecs.join(assign, Seq("did"))
    val rcos = round(Similarity.cosine(col("a.v"), col("b.v")) * 1000000.0) / 1000000.0
    val twin = emb.select(col("vec_id")).except(
      av.as("a").join(av.as("b"),
          col("a.cluster") === col("b.cluster") && col("b.did") < col("a.did"))
        .where(rcos >= 0.8).select(col("a.did").as("vec_id")))
      .collect().map(_.getLong(0)).toSet
    assert(got == twin, "single-batch ingest must equal the smaller-id twin")
  }
}
