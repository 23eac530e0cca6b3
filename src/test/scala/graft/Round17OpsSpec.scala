package graft

import org.apache.spark.sql.functions._

/** Round-17: composition safety for operators that key broadcast state
  * by a physical partition index. The r16 failure class: a pass that
  * reads `TaskContext.getPartitionId()` inside `Dataset.mapPartitions`
  * sees the FINAL RDD of the task — under a union the second child's
  * task pids are offset by the first child's partition count, so any
  * per-partition broadcast lookup (boundary continuations, exclusive
  * prefix offsets) walks off the map and silently drops rows (q472:
  * 24 rows instead of 56 at 32 shuffle partitions). Every such operator
  * must instead take the split index its OWN RDD's compute receives —
  * these specs pin the contract by running each operator (a) standalone,
  * (b) as the SECOND child of a unionByName, (c) under a downstream
  * coalesce(1), and (d) at 4 vs 32 partitions. */
class Round17OpsSpec extends GraftSpec {
  import spark.implicits._

  /** 64 unique names over 32 range partitions: ~2 rows per partition
    * with w=4 forces most neighbor pairs ACROSS partition boundaries —
    * the q472 regression fixture (pair loss can never return quietly). */
  private lazy val names64 = (0 until 64)
    .map(i => (i.toLong, f"name-${(i * 37) % 64}%03d"))
    .toDF("id", "name")
    .withColumn("rname", reverse(col("name")))
    .localCheckpoint()

  private def pairSet(df: org.apache.spark.sql.DataFrame): Set[(Long, Long, Int)] =
    df.select("id", "nb_id", "nb_off").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getInt(2))).toSet

  test("SortedNeighborhood fixture: >= half of all pairs cross range-partition boundaries at 32 partitions") {
    import graft.operators.SortedNeighborhood
    // partition assignment under the operator's own exchange shape
    val pidOf = names64.repartitionByRange(32, col("name"))
      .withColumn("pid", spark_partition_id())
      .select("id", "pid").collect()
      .map(r => (r.getLong(0), r.getInt(1))).toMap
    val got = pairSet(SortedNeighborhood.pairs(names64, Seq("name"),
      w = 4, partitions = 32))
    // window-lead twin: each row meets exactly its 4 global successors
    assert(got.size == 246, s"64 rows, w=4 -> 246 pairs, got ${got.size}")
    val w = org.apache.spark.sql.expressions.Window.orderBy("name")
    val twin = (1 to 4).flatMap { k =>
      names64.select(col("id"), lead(col("id"), k).over(w).as("nb_id"),
          lit(k).as("nb_off"))
        .where(col("nb_id").isNotNull).collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getInt(2)))
    }.toSet
    assert(got == twin)
    val crossing = got.count { case (a, b, _) => pidOf(a) != pidOf(b) }
    assert(crossing * 2 >= got.size,
      s"fixture must exercise boundaries: only $crossing/${got.size} cross")
  }

  test("SortedNeighborhood.pairs is union/coalesce/partition-count invariant (q472 shape)") {
    import graft.operators.SortedNeighborhood
    val fwd = SortedNeighborhood.pairs(names64, Seq("name"), w = 4,
      partitions = 32)
    val rev = SortedNeighborhood.pairs(names64, Seq("rname"), w = 4,
      partitions = 32)
    val revAlone = pairSet(rev)
    assert(revAlone.size == 246)
    // (a) SECOND child of a union: the task pids of rev's pass are
    // offset by fwd's 32 partitions — the exact q472 composition
    val u = fwd.withColumn("src", lit(1))
      .unionByName(rev.withColumn("src", lit(2)))
    val revInUnion = pairSet(u.where(col("src") === 2))
    assert(revInUnion == revAlone,
      "pairs must survive running as a union's second child")
    // (b) downstream coalesce(1) renumbers task partitions to one
    assert(pairSet(rev.coalesce(1)) == revAlone)
    // (c) the pair set is partitioning-independent
    val at4 = pairSet(SortedNeighborhood.pairs(names64, Seq("rname"),
      w = 4, partitions = 4))
    assert(at4 == revAlone)
  }

  test("DistributedRank.prefixSum is union/coalesce/partition-count invariant") {
    import graft.operators.DistributedRank
    val df = (0 until 97).map(i => (i.toLong, ((i * 53) % 97).toLong))
      .toDF("id", "v").localCheckpoint()
    def run(parts: Int) = DistributedRank.prefixSum(df, Nil,
      Seq(col("v"), col("id")), Seq("v" -> "cum"), inclusive = true,
      partitions = parts)
    def rows(d: org.apache.spark.sql.DataFrame): Set[(Long, Long, Long)] =
      d.select("id", "v", "cum").collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    // scala-computed expected: inclusive running sum in (v, id) order
    var cum = 0L
    val expected = (0 until 97).map(i => (i.toLong, ((i * 53) % 97).toLong))
      .sortBy { case (id, v) => (v, id) }
      .map { case (id, v) => cum += v; (id, v, cum) }.toSet
    val a = run(32)
    val b = run(32) // an independent instance for the union's second slot
    assert(rows(a) == expected)
    val u = a.withColumn("src", lit(1))
      .unionByName(b.withColumn("src", lit(2)))
    assert(rows(u.where(col("src") === 2).drop("src")) == expected,
      "prefixSum must survive running as a union's second child")
    assert(rows(b.coalesce(1)) == expected)
    assert(rows(run(4)) == expected)
  }

  test("TrainingPrep budget scans are union-composition safe") {
    import graft.operators.TrainingPrep
    val docs = (0 until 80).map { i =>
      (i.toLong, 10L + (i * 13) % 40,
        Seq.fill(1 + (i * 7) % 5)("w").mkString(" "))
    }.toDF("doc_id", "n_chars", "text").localCheckpoint()
    val sel = TrainingPrep.selectUnderBudget(docs, budgetTokens = 100L,
      partitions = 16)
    val alone = sel.collect().map(r => (r.getLong(0), r.getLong(2))).toSet
    assert(alone.nonEmpty)
    val u = sel.withColumn("src", lit(1)).unionByName(
      TrainingPrep.selectUnderBudget(docs, budgetTokens = 100L,
        partitions = 16).withColumn("src", lit(2)))
    val second = u.where(col("src") === 2)
      .collect().map(r => (r.getLong(0), r.getLong(2))).toSet
    assert(second == alone,
      "selectUnderBudget must survive running as a union's second child")
  }

  test("scaledK pin: the q464 oracle unrolls k=8 at both gate scales") {
    // mirrors q464_stream_semdedup's require so a scale/table
    // regeneration that moves scaledK off the floor is diagnosable from
    // sbt test, not only from a driver run
    import graft.operators.Similarity
    for (d <- Seq(sf0001, sf001)) {
      val emb = spark.read.parquet(s"$d/embeddings.parquet")
      assert(Similarity.scaledK(emb) == 8,
        s"q464's pinned k=8 oracle no longer matches scaledK at $d")
    }
  }
}
