package graft

import graft.operators.Dedup
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Scale evidence for the near-dup rewrites, beyond the driver's sf0.1:
  *
  *  1. 10× corpus (50k docs, replica-disjoint vocabularies so the true
  *     pair structure replicates exactly): shingle + minhash timings must
  *     grow ~linearly, pair counts exactly 10×.
  *  2. Adversarial hot-shingle corpus: every doc ends with the same
  *     stop-phrase (hot shingles with df == corpus size). The round-1
  *     unguarded inverted-index join explodes to ~df²/2 candidate rows on
  *     those keys; the prefix filter ranks them last and never joins them.
  *     Both shapes are timed head-to-head on the same corpus.
  *
  * `sbt "Test/runMain graft.DedupScaleBench"`
  */
object DedupScaleBench {

  /** Round-1 shape: join ALL shingle occurrences, count-aggregate —
    * correct, but candidate rows = sum over shingles of df². Kept here
    * only as the scaling foil. */
  private def unguardedJaccardPairs(docs: DataFrame, threshold: Double): DataFrame = {
    val spark = docs.sparkSession
    import spark.implicits._
    val sh = docs.select(col("doc_id").cast("long"), col("text")).as[(Long, String)]
      .flatMap { case (id, text) =>
        val ws = text.split(" ", -1)
        val g = if (ws.length < 3) IndexedSeq.empty[String]
        else (0 to ws.length - 3).map(i => ws.slice(i, i + 3).mkString(" ")).distinct
        g.iterator.map(s => (id, g.length, s))
      }.toDF("did", "nsh", "sh")
      .select(col("did"), col("nsh"), xxhash64(col("sh")).as("sh"))
    val inter = sh.as("a").join(sh.as("b"),
        col("a.sh") === col("b.sh") && col("a.did") < col("b.did"))
      .groupBy(col("a.did").as("id_a"), col("b.did").as("id_b"),
        col("a.nsh").as("na"), col("b.nsh").as("nb"))
      .agg(count(lit(1)).as("inter"))
    val j = col("inter").cast("double") / (col("na") + col("nb") - col("inter"))
    inter.where(j >= threshold).select(col("id_a"), col("id_b"))
  }

  def main(args: Array[String]): Unit = {
    val spark = TestSpark.spark
    import spark.implicits._
    def time[A](label: String)(f: => A): A = {
      val t0 = System.nanoTime(); val r = f
      println(f"== $label: ${(System.nanoTime() - t0) / 1e9}%.2f s"); r
    }
    val base = spark.read.parquet("/root/testdata/sf0.1/documents.parquet")
      .select("doc_id", "text")

    // ---- 1. 10x corpus with replica-disjoint vocabularies
    val x10 = (0 until 10).map { k =>
      base.select((col("doc_id") + k * 1000000L).as("doc_id"),
        when(lit(k) === 0, col("text"))
          .otherwise(regexp_replace(col("text"), "(\\S+)", s"$$1_r$k")).as("text"))
    }.reduce(_ union _).cache()
    println(s"== 10x corpus: ${x10.count()} docs")
    val basePairs = time("sf0.1 shingle pairs")(Dedup.shingleJaccardPairs(base, 0.5).count())
    val x10Pairs = time("10x shingle pairs")(Dedup.shingleJaccardPairs(x10, 0.5).count())
    assert(x10Pairs == 10 * basePairs, s"$x10Pairs != 10*$basePairs")
    val baseMh = time("sf0.1 minhash pairs")(Dedup.minHashLshPairs(base, 0.5).count())
    val x10Mh = time("10x minhash pairs")(Dedup.minHashLshPairs(x10, 0.5).count())
    println(s"== minhash recall at 10x: $x10Mh vs exact ${10 * basePairs} (base $baseMh)")

    // ---- clusters: connected components over the exact pairs must
    // replicate exactly (replica-disjoint vocabularies -> disjoint graphs)
    val baseCl = time("sf0.1 dup clusters")(
      Dedup.duplicateClusters(Dedup.shingleJaccardPairs(base, 0.5)).count())
    val x10Cl = time("10x dup clusters")(
      Dedup.duplicateClusters(Dedup.shingleJaccardPairs(x10, 0.5)).count())
    assert(x10Cl == 10 * baseCl, s"$x10Cl != 10*$baseCl")

    // ---- boilerplate gate: scale-default shuffle anti-join vs the
    // explicit broadcast opt-in, head-to-head at 1x and 10x (the hot-set
    // bound argument says the default must not cost much even when the
    // hot set happens to be small)
    import graft.operators.TrainingPrep
    val baseBp = time("sf0.1 boilerplate (shuffle gate)")(
      TrainingPrep.removeBoilerplate(base, 8, 2).count())
    val baseBpB = time("sf0.1 boilerplate (broadcast opt-in)")(
      TrainingPrep.removeBoilerplate(base, 8, 2, broadcastHotSet = true).count())
    assert(baseBp == baseBpB)
    val x10Bp = time("10x boilerplate (shuffle gate)")(
      TrainingPrep.removeBoilerplate(x10, 8, 2).count())
    val x10BpB = time("10x boilerplate (broadcast opt-in)")(
      TrainingPrep.removeBoilerplate(x10, 8, 2, broadcastHotSet = true).count())
    assert(x10Bp == x10BpB)
    println(s"== boilerplate rows: 1x $baseBp, 10x $x10Bp (gate shapes agree)")
    x10.unpersist()

    // ---- 2. adversarial hot-shingle corpus (df == corpus size)
    val hot = "the quick brown fox jumps over the lazy dog and then some more"
    val adv = base.select(col("doc_id"), concat(col("text"), lit(" " + hot)).as("text"))
      .cache()
    adv.count()
    val prefixed = time("ADV prefix-filtered")(Dedup.shingleJaccardPairs(adv, 0.5)
      .select("id_a", "id_b").collect().map(r => (r.getLong(0), r.getLong(1))).toSet)
    val unguarded = time("ADV unguarded (round-1 shape)")(
      unguardedJaccardPairs(adv, 0.5).collect()
        .map(r => (r.getLong(0), r.getLong(1))).toSet)
    assert(prefixed == unguarded, "adversarial outputs differ")
    println(s"== adversarial pairs: ${unguarded.size} (both shapes agree)")
    spark.stop()
  }
}
