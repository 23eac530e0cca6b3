package graft

import graft.operators.{CorpusPrep, Dedup, TrainingPrep}
import graft.sources.TableWriters
import java.nio.file.Files
import org.apache.spark.sql.functions._

/** End-to-end training-data pipeline drive over the sf0.01 corpus — the
  * composition a user of the engine actually runs, with asserted row
  * accounting at every stage:
  *
  *   documents → annotate+gate+exact-dedup (CorpusPrep) → benchmark
  *   decontamination → MinHash near-dup dedup (keep smallest id) →
  *   sequence packing → sharded parquet write.
  *
  * `sbt "Test/runMain graft.TrainingPipelineDrive"` */
object TrainingPipelineDrive {
  def main(args: Array[String]): Unit = {
    val spark = TestSpark.spark
    import spark.implicits._
    val docs = spark.read.parquet("/root/testdata/sf0.01/documents.parquet")
      .select("doc_id", "text")
    val n0 = docs.count()
    println(s"== corpus: $n0 docs")

    // 1. annotate + quality/language gate + exact dedup (one scan + one shuffle)
    val prepped = CorpusPrep.prepare(docs).cache()
    val n1 = prepped.count()
    println(s"== after gate+exact-dedup: $n1 (${n0 - n1} removed)")
    assert(n1 > 0 && n1 <= n0)

    // 2. decontaminate against the benchmark subset (doc_id % 97 == 0)
    val keptDocs = docs.join(prepped.select("doc_id"), "doc_id")
    val train = keptDocs.where(col("doc_id") % 97 =!= 0)
    val bench = docs.where(col("doc_id") % 97 === 0)
    val contaminated = TrainingPrep.contaminatedIds(train, bench)
    val nContam = contaminated.count()
    val clean = train.join(contaminated, Seq("doc_id"), "left_anti")
    val n2 = clean.count()
    println(s"== after decontamination: $n2 ($nContam contaminated removed)")
    assert(n2 == train.count() - nContam)

    // 3. near-dup dedup: MinHash pairs at J>=0.5, drop the larger id of
    // each pair (connected via the smaller-id keeper)
    val pairs = Dedup.minHashLshPairs(clean, 0.5)
    val drop = pairs.select(col("id_b").as("doc_id")).distinct()
    val deduped = clean.join(drop, Seq("doc_id"), "left_anti").cache()
    val n3 = deduped.count()
    println(s"== after near-dup dedup: $n3 (${n2 - n3} near-dups removed)")
    assert(n3 <= n2)

    // 4. sequence packing into 256-token streams over 4 shards
    val packed = TrainingPrep.pack(deduped, 256, shards = 4)
    val n4 = packed.count()
    assert(n4 == n3, "packing is 1:1 per doc")
    val shardSeqs = packed.groupBy("shard")
      .agg(countDistinct("pack_seq").as("seqs"), sum("n_tokens").as("toks"))
      .orderBy("shard").collect()
    shardSeqs.foreach(r => println(
      s"==   shard ${r.get(0)}: ${r.get(1)} sequences, ${r.get(2)} tokens"))

    // 5. sharded parquet publish, partitioned for downstream readers
    val out = Files.createTempDirectory("training-shards").toString
    TableWriters.parquetPartitioned(
      packed.join(deduped, "doc_id"), s"$out/corpus", Seq("shard"))
    val back = spark.read.parquet(s"$out/corpus")
    assert(back.count() == n3)
    assert(back.select("shard").distinct().count() == 4)
    println(s"== published ${back.count()} rows across 4 shards at $out/corpus")
    println("== training pipeline drive: OK")
    spark.stop()
  }
}
