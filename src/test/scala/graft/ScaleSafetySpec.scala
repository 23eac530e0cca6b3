package graft

import graft.operators.{Dedup, Similarity}
import org.apache.spark.sql.functions._

/** Proofs for the scale-safe candidate-generation rewrites: results must be
  * IDENTICAL to the naive/exact forms, and the plans must be free of the
  * 100×-fatal shapes (cartesian products, corpus-wide broadcasts, per-row
  * window shuffles) they replaced. */
class ScaleSafetySpec extends GraftSpec {
  import spark.implicits._

  lazy val docs = spark.read.parquet(s"$sf001/documents.parquet").cache()
  lazy val emb = spark.read.parquet(s"$sf001/embeddings.parquet").cache()

  /** Brute-force shingle-Jaccard over collected sets — the spec oracle. */
  private def naiveJaccardPairs(rows: Seq[(Long, String)], t: Double, n: Int = 3) = {
    def sh(s: String) = {
      val ws = s.split(" ", -1)
      if (ws.length < n) Set.empty[String]
      else (0 to ws.length - n).map(i => ws.slice(i, i + n).mkString(" ")).toSet
    }
    val sets = rows.map { case (id, txt) => id -> sh(txt) }
    (for {
      (ia, sa) <- sets; (ib, sb) <- sets
      if ia < ib && sa.nonEmpty && sb.nonEmpty
      j = (sa & sb).size.toDouble / (sa | sb).size
      if j >= t
    } yield (ia, ib, math.round(j * 1e6) / 1e6)).toSet
  }

  test("ShingleHashes expression == xxhash64 over the string shingle spec") {
    val texts = docs.select("text").as[String].take(50) ++
      Seq("", "a", "a b", "a b c", "a  b c d", " x y z ", "a b c a b c")
    for (t <- texts) {
      val want = Dedup.shingleSeq(t, 3)
        .map(g => org.apache.spark.sql.catalyst.expressions.XxHash64Function.hash(
          org.apache.spark.unsafe.types.UTF8String.fromString(g),
          org.apache.spark.sql.types.StringType, 42L))
      val got = graft.expressions.ShingleHashes
        .compute(org.apache.spark.unsafe.types.UTF8String.fromString(t), 3)
        .toLongArray().toSeq
      assert(got == want, s"mismatch for text '$t'")
    }
    // and the Column route agrees with the SQL xxhash64 of the string form
    val viaCols = docs.limit(20).select(col("doc_id"),
        explode(Dedup.shingles(col("text"))).as("g"))
      .select(col("doc_id"), xxhash64(col("g")).as("h"))
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val viaExpr = docs.limit(20).select(col("doc_id"),
        explode(graft.expressions.ShingleHashes.shingle_hashes(col("text"), 3)).as("h"))
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(viaExpr == viaCols)
  }

  test("prefix-filtered shingle pairs == brute force on the real corpus") {
    val got = Dedup.shingleJaccardPairs(docs, 0.5)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
    val want = naiveJaccardPairs(
      docs.select(col("doc_id"), col("text")).as[(Long, String)].collect().toSeq, 0.5)
    assert(got == want, s"got ${got.size} want ${want.size}")
    assert(want.nonEmpty)
  }

  test("prefix filter survives an adversarial hot-shingle corpus") {
    // every doc shares one ubiquitous stop-phrase prefix (hot shingles with
    // df == corpus size) but true near-dups differ only in rare tails —
    // the old unguarded self-join went df² on exactly this shape
    val hot = "the quick brown fox jumps over the lazy dog again and again"
    val rows = (0L until 60L).map { i =>
      val tail = if (i % 2 == 0) s"unique tail $i alpha beta gamma delta"
      else s"unique tail ${i - 1} alpha beta gamma delta" // near-dup of i-1
      (i, s"$hot $tail")
    }
    val df = rows.toDF("doc_id", "text")
    val got = Dedup.shingleJaccardPairs(df, 0.5)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
    assert(got == naiveJaccardPairs(rows, 0.5))
    assert(got.nonEmpty)
  }

  test("shingle/minhash plans contain no cartesian or corpus broadcast-nested-loop") {
    for (plan <- Seq(
        Dedup.shingleJaccardPairs(docs, 0.5).queryExecution.executedPlan.toString,
        Dedup.minHashLshPairs(docs, 0.5).queryExecution.executedPlan.toString)) {
      assert(!plan.contains("CartesianProduct"), "cartesian in plan")
      assert(!plan.contains("BroadcastNestedLoopJoin"), "nested-loop join in plan")
    }
  }

  test("q22 executed adaptive plan materializes exchange reuse (ReusedExchange >= 2)") {
    // The PPJoin pipeline's cost model rests on the shared shingle
    // exchanges being READ MORE THAN ONCE rather than re-executed per
    // subtree: the sh-keyed prefix exchange feeds both sides of the
    // self-join, and the did-keyed exploded exchange feeds both the prefix
    // pipeline and the verification set build. `explain` of the UNEXECUTED
    // AdaptiveSparkPlan can't show this (AQE inserts ReusedExchange at
    // runtime), so this asserts on the plan AFTER an action — a conf or
    // Spark upgrade that silently disabled stage reuse would re-quadruple
    // the corpus scans and fail here.
    // fresh UNCACHED scan — the registered query's real input shape. A
    // re-read of the SAME path still resolves to the suite's cached
    // InMemoryRelation (CacheManager matches by canonicalized plan), which
    // changes AQE's stage layout and hides the reuse, so scan a COPY of
    // the file at a path nothing has cached.
    val tmp = java.nio.file.Files.createTempDirectory("q22plan")
    val copied = tmp.resolve("documents.parquet")
    java.nio.file.Files.copy(
      java.nio.file.Paths.get(s"$sf001/documents.parquet"), copied)
    val freshDocs = spark.read.parquet(copied.toString)
    val df = Dedup.shingleJaccardPairs(freshDocs, 0.5)
    df.collect()
    val finalPlan = df.queryExecution.executedPlan.toString
    assert(finalPlan.contains("isFinalPlan=true"), finalPlan.take(300))
    val reused = "ReusedExchange".r.findAllIn(finalPlan).length
    assert(reused >= 2, s"expected >=2 ReusedExchange nodes, got $reused in:\n" +
      finalPlan.take(3000))
  }

  test("bm25 plan: one corpus explode, checkpointed tf feeds df, top-k is TakeOrdered") {
    // fresh uncached scan so the cost shape is the registered query's
    val fresh = spark.read.parquet(s"$sf001/documents.parquet")
    val df = graft.operators.TrainingPrep.bm25(fresh, Seq("spark", "window"), 10)
    df.collect()
    // executedPlan.toString prints final + initial AQE sections; audit the
    // FINAL one
    val plan = df.queryExecution.executedPlan.toString.split("== Initial Plan ==")(0)
    // the corpus text is exploded exactly once (sealed inside the
    // checkpointed tf); both [doc_id,term,tf,dl] scans are the SAME RDD
    assert("Generate explode".r.findAllIn(plan).isEmpty,
      "corpus explode must be sealed inside the checkpointed tf, not replayed")
    assert(plan.contains("TakeOrderedAndProject"), "top-k must not global-sort")
    val corpusScans = "FileScan parquet".r.findAllIn(plan).length
    assert(corpusScans == 1, s"only the avgdl pass may rescan the corpus, got $corpusScans")
  }

  test("surprisal plan: no hard broadcast hint on the model, no window anywhere") {
    // at tiny scale the planner measures the model small and broadcasts —
    // correct. What must hold for a web-scale vocab is that nothing FORCES
    // the broadcast: with the threshold disabled, the model join must
    // plan as a shuffle join (only the single-row total keeps its explicit
    // broadcast hint), and the total must never be an unpartitioned window
    val prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold", "10485760")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try {
      val df = graft.operators.TrainingPrep.unigramSurprisal(docs)
      val initial = df.queryExecution.sparkPlan.toString
      assert(!initial.contains("BroadcastHashJoin"),
        "model join must degrade to shuffle when not measured small")
      assert(!initial.contains("Window"), "no window in the surprisal plan at all")
    } finally spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
  }

  test("LSH hot-bucket guard: hub mass excised, genuine pairs keep their other buckets") {
    import spark.implicits._
    // 40 identical "hub" vectors (one constant embedding — an encoder
    // failure mode) + one genuine near-dup pair off-axis
    val hub = (0L until 40L).map(i => (i, Array(1f, 0f, 0f, 0f)))
    val pair = Seq((100L, Array(0f, 1f, 0.1f, 0f)), (101L, Array(0f, 1f, 0.11f, 0f)))
    val emb = (hub ++ pair).toDF("vec_id", "embedding")
    val guarded = graft.operators.Similarity
      .nearDupPairs(emb, 0.9, maxBucket = Some(10L))
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSeq
    // the hub's 780 mutual pairs are excised (every bucket they share is
    // hot); the genuine pair survives via its own cold buckets
    assert(guarded == Seq((100L, 101L)), s"got $guarded")
    val unguarded = graft.operators.Similarity.nearDupPairs(emb, 0.9)
      .collect().length
    assert(unguarded == 40 * 39 / 2 + 1, s"got $unguarded")
  }

  test("semantic dedup plan: no cartesian anywhere, CC bounded by pair count") {
    val emb = spark.read.parquet(s"$sf001/embeddings.parquet")
    val df = graft.operators.Similarity.semanticDedup(emb, 0.8)
    df.collect()
    val plan = df.queryExecution.executedPlan.toString
    assert(!plan.contains("CartesianProduct"), "cartesian in semantic dedup plan")
  }

  test("SortedIntersectCount == size(array_intersect) on sorted random sets") {
    val rnd = new scala.util.Random(7)
    val rows = (0 until 200).map { i =>
      val a = Seq.fill(rnd.nextInt(50))(rnd.nextInt(40).toLong).distinct.sorted
      val b = Seq.fill(rnd.nextInt(50))(rnd.nextInt(40).toLong).distinct.sorted
      (i, a, b)
    }
    val df = rows.toDF("i", "a", "b")
    val got = df.select(col("i"),
      graft.expressions.SetFunctions.sorted_intersect_count(col("a"), col("b")).as("m"),
      size(array_intersect(col("a"), col("b"))).as("w"))
    assert(got.where(col("m") =!= col("w")).count() == 0)
    // empty-side edges
    val e = Seq((Seq.empty[Long], Seq(1L, 2L)), (Seq(1L, 2L), Seq.empty[Long]),
      (Seq.empty[Long], Seq.empty[Long])).toDF("a", "b")
    assert(e.select(graft.expressions.SetFunctions.sorted_intersect_count(col("a"), col("b")))
      .as[Int].collect().toSeq == Seq(0, 0, 0))
  }

  test("TextStats kernel == declarative split/HOF/regex forms") {
    import graft.operators.TextAnalysis
    val texts = docs.select("text").as[String].take(100) ++ Seq(
      "", " ", "  ", "the the the", "der und ist", "el y es", "le et est",
      "a,b.c!", "naïve café — ünïcode ¡text! 你好", "the  a   of", "x")
    val df = texts.zipWithIndex.map { case (t, i) => (i, t) }.toSeq.toDF("i", "text")
    val st = graft.expressions.TextStats.text_stats(col("text"))
    val declaredHits = TextAnalysis.Profiles.zipWithIndex.map { case ((_, ws), k) =>
      (size(filter(split(col("text"), " "), w => w.isin(ws.map(lit): _*))).cast("long")
        === element_at(st, k + 2)).as(s"h$k")
    }
    val checks = df.select(
      (size(split(col("text"), " ")).cast("long") === element_at(st, 1)).as("tok") +:
      (length(regexp_replace(col("text"), "[A-Za-z0-9 ]", "")).cast("long")
        === element_at(st, 6)).as("punct") +:
      (length(col("text")).cast("long") === element_at(st, 7)).as("chars") +:
      declaredHits: _*)
    checks.columns.foreach { c =>
      assert(checks.where(not(col(c))).count() == 0, s"mismatch in $c")
    }
  }

  test("decontamination plan: broadcast semi-join, corpus side unshuffled") {
    val plan = graft.operators.TrainingPrep.contaminatedIds(
      docs.where(col("doc_id") % 97 =!= 0), docs.where(col("doc_id") % 97 === 0))
      .queryExecution.executedPlan.toString
    assert(plan.contains("LeftSemi"), plan.take(500))
    assert(plan.contains("BroadcastExchange"), plan.take(500))
  }

  test("boilerplate gate: anti-join both ways, broadcast only on explicit opt-in") {
    import graft.operators.TrainingPrep
    // default: no forced broadcast — the hot set's size is unbounded by
    // construction (distinct-segments / (maxDocs+1)), so the plan must not
    // carry a broadcast HINT; AQE may still pick one at runtime if the
    // built set measures small, which is the shape we want
    val dflt = TrainingPrep.removeBoilerplate(docs, 8, 2)
    val dfltPlan = dflt.queryExecution.executedPlan.toString
    assert(dfltPlan.contains("LeftAnti"), dfltPlan.take(500))
    assert(!dflt.queryExecution.optimizedPlan.toString.contains("broadcast"),
      "default gate must not force a broadcast of the hot set")
    // opt-in: explicit broadcast for callers that KNOW the cutoff bounds it
    val bc = TrainingPrep.removeBoilerplate(docs, 8, 2, broadcastHotSet = true)
    val bcPlan = bc.queryExecution.executedPlan.toString
    assert(bcPlan.contains("LeftAnti"), bcPlan.take(500))
    assert(bcPlan.contains("BroadcastExchange"), bcPlan.take(500))
    // identical results either way
    assert(dflt.orderBy("doc_id").collect().toSeq ==
      bc.orderBy("doc_id").collect().toSeq)
  }

  test("duplicate clusters: chains collapse transitively to the min label") {
    val pairs = ((1L to 9L).map(i => (i, i + 1)) ++ // 10-node chain => 9 rounds of hops
      Seq((100L, 101L), (200L, 201L), (201L, 202L))).toDF("id_a", "id_b")
    val cc = Dedup.duplicateClusters(pairs)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    (1L to 10L).foreach(i => assert(cc(i) == 1L, s"node $i"))
    Seq(100L, 101L).foreach(i => assert(cc(i) == 100L))
    Seq(200L, 201L, 202L).foreach(i => assert(cc(i) == 200L))
    assert(cc.size == 15)
    // insufficient round budget must fail loudly, never return partial labels
    intercept[IllegalStateException] {
      Dedup.duplicateClusters(pairs, maxRounds = 2).collect()
    }
  }

  test("SRP near-dup pairs == exact all-pairs on a planted-dup corpus") {
    // twins of the first 20 vectors (cos == 1.0) on top of the real corpus
    val twins = emb.limit(20).select((col("vec_id") + 100000).as("vec_id"),
      col("embedding"), col("label"))
    val corpus = emb.union(twins)
    val got = Similarity.nearDupPairs(corpus, 0.8)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
    val want = Similarity.nearDupPairsExact(corpus, 0.8)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
    assert(want.size >= 20)
    assert(got == want, s"recall ${got.size}/${want.size}")
  }

  test("SRP near-dup plan has no cartesian / nested-loop join") {
    val plan = Similarity.nearDupPairs(emb, 0.8).queryExecution.executedPlan.toString
    assert(!plan.contains("CartesianProduct"))
    assert(!plan.contains("BroadcastNestedLoopJoin"))
  }

  test("IVF assignment runs shuffle-free and matches the windowed argmax") {
    // new assignment = single projection; verify the whole ivf result is
    // unchanged vs round-1 semantics by checking recall against brute force
    // (exact per-cell equality is covered by determinism: same centroids,
    // same argmax tie-break)
    val brute = Similarity.bruteForceTopK(emb, 0L, 10)
      .collect().map(_.getLong(0)).toSet
    val ivf = Similarity.ivfTopK(emb, 0L, 10, nCells = 8, nProbe = 4)
      .collect().map(_.getLong(0)).toSet
    assert(ivf.size == 10 && ivf.intersect(brute).size >= 5)
  }

  test("native SrpBucketKeys is bit-identical to the HOF fold") {
    import graft.expressions.SrpBucketKeys.srp_bucket_keys
    val tables = 6; val planes = 4
    val hof = array((0 until tables).map(t =>
      graft.operators.Similarity.srpKeyHof(col("embedding"), t, planes)): _*)
    val diff = emb.select(
        srp_bucket_keys(col("embedding"), tables, planes).as("native"), hof.as("hof"))
      .where(col("native") =!= col("hof")).count()
    assert(diff == 0)
  }

  test("simhash block-combination candidates: bound holds, twins found, no dup rows") {
    val twins = docs.limit(8).select((col("doc_id") + 100000).as("doc_id"), col("text"))
    val both = docs.select("doc_id", "text").union(twins)
    val pairs = Dedup.simHashPairs(both, 3).collect()
    assert(pairs.forall(_.getLong(2) <= 3))
    val set = pairs.map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(set.size == pairs.length, "duplicate candidate rows leaked")
    val twinPairs = docs.limit(8).select("doc_id").as[Long].collect()
      .map(id => (id, id + 100000)).toSet
    assert(twinPairs.subsetOf(set), "identical docs must be hamming-0 pairs")
  }

  test("span-removal plan: no cartesian, dup side partial-aggregates below its shuffle") {
    val df = graft.operators.TrainingPrep.removeDuplicateSpans(docs, 5)
    df.collect()
    val plan = df.queryExecution.executedPlan.toString.split("== Initial Plan ==")(0)
    assert(!plan.contains("CartesianProduct"), "cartesian in span-removal plan")
    assert(!plan.contains("BroadcastNestedLoopJoin"), "BNLJ in span-removal plan")
    // the dup-detection aggregate must map-side combine BEFORE the gram
    // exchange — that (not exchange reuse) is what bounds the shuffle
    assert("partial_count".r.findAllIn(plan).nonEmpty &&
      "partial_min".r.findAllIn(plan).nonEmpty,
      "keeper aggregation must have a partial (map-side) phase")
    // island merge windows are doc-partitioned, never global
    assert(!plan.contains("windowspecdefinition()") &&
      !"Window \\[[^\\]]*\\], \\[\\]".r.findAllIn(plan).hasNext,
      "unpartitioned window in span-removal plan")
  }

  test("shingle verify plan: candidate gate pushes below the sorted-set aggregation") {
    import org.apache.spark.sql.catalyst.plans.LeftSemi
    import org.apache.spark.sql.catalyst.plans.logical.{Aggregate, Join}
    val plan = graft.operators.Dedup.shingleJaccardPairs(docs, 0.5)
      .queryExecution.optimizedPlan
    // the sorted-set build (the aggregate producing `set`) must sit
    // ABOVE a LeftSemi gate — i.e. the candidate-docs gate lies below
    // the aggregation, so the corpus-sized explode+sort runs over
    // candidate docs only. (The prefix-ranking sort_array aggregate is
    // deliberately ungated: it feeds candidate GENERATION.)
    val setAggs = plan.collect {
      case a: Aggregate if a.aggregateExpressions.exists(e =>
        e.name == "set" && e.toString.contains("sort_array")) => a
    }
    assert(setAggs.nonEmpty, "no sorted-set aggregate found")
    setAggs.foreach { a =>
      assert(a.collect { case j: Join if j.joinType == LeftSemi => j }.nonEmpty,
        "sorted-set aggregate is not gated by a pushed-down LeftSemi")
    }
  }

  test("pmi plan: self-join sides are one subplan; no hard hint on the vocab join") {
    val prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold", "10485760")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try {
      val df = graft.operators.TrainingPrep.pmiPairs(docs, 40, 5L, 30)
      // sparkPlan = pre-EnsureRequirements: hints visible as join CHOICE
      val initial = df.queryExecution.sparkPlan.toString
      // only the single-row doc count keeps an explicit broadcast; the
      // vocab joins must degrade to shuffle joins
      val bnlj = "BroadcastNestedLoopJoin".r.findAllIn(initial).length
      assert(bnlj == 1, s"expected exactly the 1-row count broadcast, got $bnlj")
      assert(!initial.contains("BroadcastHashJoin"),
        "vocab/pair joins must not be force-broadcast")
      assert(initial.contains("TakeOrderedAndProject"),
        "top-k must not be a global sort")
    } finally spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
  }

  test("bigram surprisal plan: no self-join for pairs, no window, no model hint") {
    val prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold", "10485760")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try {
      val df = graft.operators.TrainingPrep.bigramSurprisal(docs)
      val initial = df.queryExecution.sparkPlan.toString
      assert(!initial.contains("Window"), "no window in the bigram plan")
      // pair generation is arrays_zip in the scan project — the only
      // joins are the model lookups (shuffle) + the 1-row total broadcast
      val bnlj = "BroadcastNestedLoopJoin".r.findAllIn(initial).length
      assert(bnlj == 1, s"only the 1-row total may broadcast, got $bnlj")
      assert(!initial.contains("BroadcastHashJoin"),
        "model joins must not be force-broadcast")
    } finally spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
  }
}
