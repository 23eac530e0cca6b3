package graft

import graft.operators.Dedup
import org.apache.spark.sql.functions._

/** Stage-by-stage wall-clock breakdown of q22_dedup_shingle at sf0.1 —
  * identifies which exchange/aggregation dominates before optimizing.
  * `sbt "Test/runMain graft.Q22Profile"` */
object Q22Profile {
  def main(args: Array[String]): Unit = {
    val spark = TestSpark.spark
    def time[A](label: String)(f: => A): A = {
      val t0 = System.nanoTime(); val r = f
      println(f"== $label: ${(System.nanoTime() - t0) / 1e9}%.2f s"); r
    }
    val docs = spark.read.parquet("/root/testdata/sf0.1/documents.parquet")
      .select("doc_id", "text")
    println(s"== docs: ${docs.count()}")

    val exploded = docs.select(col("doc_id").cast("long").as("did"),
        graft.expressions.ShingleHashes.shingle_hashes(col("text"), 3).as("shs"))
      .select(col("did"), size(col("shs")).as("nsh"), explode(col("shs")).as("sh"))

    (1 to 2).foreach { i =>
      time(s"[$i] exploded shingles count")(exploded.count())
      time(s"[$i] dfreq agg")(exploded.groupBy("sh").agg(count(lit(1))).count())
      val prefix = Dedup.prefixShingles(docs, 0.5, "doc_id", "text", 3)
      time(s"[$i] prefix shingles")(prefix.count())
      val minOverlap = ceil(lit(0.5 / 1.5) * (col("a.nsh") + col("b.nsh")))
      val overlapBound = least(col("a.rk"), col("b.rk")) - 1 +
        least(col("a.nsh") - col("a.rk"), col("b.nsh") - col("b.rk")) + 1
      val cand = prefix.as("a").join(prefix.as("b"),
          col("a.sh") === col("b.sh") && col("a.did") < col("b.did") &&
            col("b.nsh") >= lit(0.5) * col("a.nsh") &&
            col("a.nsh") >= lit(0.5) * col("b.nsh") &&
            overlapBound >= minOverlap)
        .select(col("a.did").as("id_a"), col("b.did").as("id_b"))
        .distinct()
      time(s"[$i] candidates")(cand.count())
      time(s"[$i] full q22")(Dedup.shingleJaccardPairs(docs, 0.5)
        .write.mode("overwrite").format("noop").save())
    }
    spark.stop()
  }
}
