package graft

import graft.operators.Dedup
import org.apache.spark.sql.functions._

/** Scratch profiler for the dedup hot path: `sbt "Test/runMain graft.ProfileDrive"`. */
object ProfileDrive {
  def main(args: Array[String]): Unit = {
    val spark = TestSpark.spark
    import spark.implicits._
    val docs = spark.read.parquet("/root/testdata/sf0.1/documents.parquet")
    def time[T](label: String)(f: => T): T = {
      val t0 = System.nanoTime(); val r = f
      println(f"== $label: ${(System.nanoTime() - t0) / 1e9}%.2f s"); r
    }
    docs.count()
    val sets = docs.select(col("doc_id").as("did"), Dedup.shingles(col("text")).as("set"))
    time("shingle sets")(sets.write.mode("overwrite").format("noop").save())
    val sh = sets.select(col("did"), size(col("set")).as("nsh"), explode(col("set")).as("sh"))
    time("exploded count")(println(sh.count()))
    val joined = sh.as("a").join(sh.as("b"),
      col("a.sh") === col("b.sh") && col("a.did") < col("b.did"))
    time("self-join count")(println(joined.count()))
    val grouped = joined.groupBy(col("a.did"), col("b.did"), col("a.nsh"), col("b.nsh"))
      .agg(count(lit(1)).as("inter"))
    time("pair agg")(grouped.write.mode("overwrite").format("noop").save())
    time("full q22")(Dedup.shingleJaccardPairs(docs, 0.5).write.mode("overwrite").format("noop").save())
    grouped.explain("formatted")
    spark.stop()
  }
}
