package graft

import graft.operators.{CorpusPrep, TrainingPrep}
import org.apache.spark.sql.functions._

/** Scale evidence for the round-3 pipeline operators beyond the driver's
  * sf0.1: 10× corpus (replica-disjoint vocabularies, replica 0 verbatim),
  * timings must grow ~linearly and the structural counts must track the
  * replication:
  *  - corpus prep: replica 0 reproduces the sf0.1 output exactly; replicas
  *    1..9 have suffixed vocabularies, so their language gate differs —
  *    we assert replica-0 count equality and end-to-end wall time.
  *  - decontamination: benchmark = replica-0 benchmark docs; only replica
  *    0 shares shingles with it (vocabularies are disjoint), so the
  *    contaminated set must EQUAL the sf0.1 contaminated set even with
  *    10x the corpus probing the broadcast — recall and precision at 10x.
  *  - packing: per-shard token sums must equal 10x the base (token counts
  *    are suffix-invariant), shards stay balanced.
  *
  * `sbt "Test/runMain graft.PipelineScaleBench"` */
object PipelineScaleBench {
  def main(args: Array[String]): Unit = {
    val spark = TestSpark.spark
    def time[A](label: String)(f: => A): A = {
      val t0 = System.nanoTime(); val r = f
      println(f"== $label: ${(System.nanoTime() - t0) / 1e9}%.2f s"); r
    }
    val base = spark.read.parquet("/root/testdata/sf0.1/documents.parquet")
      .select("doc_id", "text", "n_chars")
    val x10 = (0 until 10).map { k =>
      base.select((col("doc_id") + k * 1000000L).as("doc_id"),
        when(lit(k) === 0, col("text"))
          .otherwise(regexp_replace(col("text"), "(\\S+)", s"$$1_r$k")).as("text"),
        col("n_chars"))
    }.reduce(_ union _).cache()
    println(s"== 10x corpus: ${x10.count()} docs")
    // warmup: JIT + codegen caches, so small-vs-10x timings compare engine
    // throughput rather than JVM cold start
    CorpusPrep.prepare(base).count()
    TrainingPrep.pack(base, 256).count()
    TrainingPrep.contaminatedIds(base.limit(500),
      base.where(col("doc_id") % 97 === 0)).count()

    // corpus prep
    val basePrep = time("sf0.1 corpus prep")(CorpusPrep.prepare(base).count())
    val x10PrepR0 = time("10x corpus prep")(
      CorpusPrep.prepare(x10).where(col("doc_id") < 1000000L).count())
    assert(x10PrepR0 == basePrep, s"$x10PrepR0 != $basePrep")

    // decontamination: replica-0 benchmark against the full 10x corpus
    val benchDocs = base.where(col("doc_id") % 97 === 0)
    val baseContam = time("sf0.1 decontam")(
      TrainingPrep.contaminatedIds(base.where(col("doc_id") % 97 =!= 0), benchDocs)
        .count())
    val x10Contam = time("10x decontam")(
      TrainingPrep.contaminatedIds(x10.where(col("doc_id") % 97 =!= 0), benchDocs)
        .count())
    assert(x10Contam == baseContam, s"$x10Contam != $baseContam (disjoint vocab)")

    // packing: tokens are suffix-invariant -> total tokens exactly 10x
    val baseToks = time("sf0.1 pack")(TrainingPrep.pack(base, 256)
      .agg(sum("n_tokens")).collect()(0).getLong(0))
    val x10Toks = time("10x pack")(TrainingPrep.pack(x10, 256)
      .agg(sum("n_tokens")).collect()(0).getLong(0))
    assert(x10Toks == 10 * baseToks, s"$x10Toks != 10*$baseToks")

    // budget selection: the two-phase prefix sum must match the
    // one-partition window twin on the FULL 10x corpus (correctness of
    // the offsets under real parallelism, not just sf0.001)
    val w = org.apache.spark.sql.expressions.Window
      .orderBy(col("n_chars").desc, col("doc_id"))
      .rowsBetween(org.apache.spark.sql.expressions.Window.unboundedPreceding, 0)
    val x10Budget = time("10x budget select (two-phase)")(
      TrainingPrep.selectUnderBudget(x10, 1000000L).count())
    val x10BudgetTwin = time("10x budget select (1-partition window twin)")(
      x10.select(col("doc_id"), size(split(col("text"), " ")).cast("long").as("n_tok"),
          col("n_chars"))
        .withColumn("cum_tok", sum("n_tok").over(w))
        .where(col("cum_tok") <= 1000000L).count())
    assert(x10Budget == x10BudgetTwin, s"$x10Budget != $x10BudgetTwin")

    // inverted index: replica vocabularies are disjoint, so the 10x index
    // restricted to unsuffixed terms must EQUAL the base index
    val baseIdx = time("sf0.1 inverted index")(
      TrainingPrep.invertedIndex(base).count())
    val x10Idx = time("10x inverted index")(
      TrainingPrep.invertedIndex(x10).cache().count())
    val x10BaseTerms = TrainingPrep.invertedIndex(x10)
      .where(!col("term").rlike("_r[1-9]$")).count()
    assert(x10BaseTerms == baseIdx, s"$x10BaseTerms != $baseIdx")
    assert(x10Idx > 9 * baseIdx, s"suffixed vocabularies must multiply terms: $x10Idx")
    spark.stop()
  }
}
