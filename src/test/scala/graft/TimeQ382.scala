package graft

import org.apache.spark.sql.functions._

/** One-off stage timing for q382 at a given sfDir (default /tmp/sf1). */
object TimeQ382 {
  def main(args: Array[String]): Unit = {
    val sfDir = if (args.nonEmpty) args(0) else "/tmp/sf1"
    val spark = TestSpark.spark
    def time[A](tag: String)(f: => A): A = {
      val t0 = System.nanoTime(); val r = f
      println(f"TIME $tag ${(System.nanoTime() - t0) / 1e9}%.2f s"); r
    }
    val li = spark.read.parquet(s"$sfDir/lineitem.parquet")
    println(s"rows: ${li.count()}")
    val base = time("base checkpoint") {
      li.select(
        round(col("l_extendedprice") * 100.0).cast("long").as("x"),
        col("l_quantity").cast("long").as("y"),
        col("l_orderkey"), col("l_linenumber"), lit(1L).as("one"))
        .localCheckpoint()
    }
    val p = time("prepare(x)") {
      graft.operators.DistributedRank.prepare(base, Nil,
        Seq(col("x"), col("l_orderkey"), col("l_linenumber")), Seq("one"))
    }
    time("second pass count") { p.ranged.count() }
    val ps = time("prefixSum(x) build") {
      graft.operators.DistributedRank.prefixSum(base, Nil,
        Seq(col("x"), col("l_orderkey"), col("l_linenumber")),
        Seq("one" -> "rn"), inclusive = true, totals = Seq("one" -> "nn"))
    }
    time("cuts agg") {
      ps.where(col("rn") === expr("(nn * 5 + 99) div 100")
          || col("rn") === expr("(nn * 95 + 99) div 100"))
        .agg(min(when(col("rn") === expr("(nn * 5 + 99) div 100"),
          col("x"))).as("lo"),
          min(when(col("rn") === expr("(nn * 95 + 99) div 100"),
            col("x"))).as("hi")).collect().foreach(println)
    }
    time("full q382") {
      SparkEntry.queries("q382_winsorized_corr")(spark, sfDir)
        .write.mode("overwrite").format("noop").save()
    }
    spark.stop()
  }
}
