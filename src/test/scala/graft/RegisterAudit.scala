package graft

/** Whole-register plan sweep: builds EVERY registered query against
  * sf0.01 and reports which physical plans contain a CartesianProduct or
  * BroadcastNestedLoopJoin — the two shapes that must only ever appear
  * for deliberate single-row/dimension broadcasts (each documented at
  * the operator). `sbt "Test/runMain graft.RegisterAudit"`. */
object RegisterAudit {
  def main(args: Array[String]): Unit = {
    val spark = TestSpark.spark
    val d = "/root/testdata/sf0.01"
    var cart = List.empty[String]
    var bnlj = List.empty[String]
    var failed = List.empty[String]
    SparkEntry.queries.toSeq.sortBy(_._1).foreach { case (name, fn) =>
      try {
        val plan = fn(spark, d).queryExecution.sparkPlan.toString
        if (plan.contains("CartesianProduct")) cart ::= name
        if (plan.contains("BroadcastNestedLoopJoin")) bnlj ::= name
      } catch {
        case e: Throwable => failed ::= s"$name: ${e.getMessage.take(80)}"
      }
    }
    println(s"== audited ${SparkEntry.queries.size} queries")
    println(s"== CartesianProduct: ${cart.sorted.mkString(", ")}")
    println(s"== BroadcastNestedLoopJoin: ${bnlj.sorted.mkString(", ")}")
    println(s"== failed to build: ${failed.sorted.mkString("; ")}")
    spark.stop()
  }
}
