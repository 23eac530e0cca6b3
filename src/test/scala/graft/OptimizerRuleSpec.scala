package graft

import graft.operators.Similarity
import graft.optimizer.NativeKernelRule
import org.apache.spark.sql.functions._

/** NativeKernelRule: the declarative HOF dot-product fold is rewritten to
  * the codegen'd FoldDotProduct kernel with bit-identical semantics. */
class OptimizerRuleSpec extends GraftSpec {
  import spark.implicits._

  lazy val emb = {
    NativeKernelRule.install(spark)
    spark.read.parquet(s"$sf001/embeddings.parquet").cache()
  }

  test("HOF dot fold is rewritten to fold_vec_dot and stays bit-identical") {
    val df = emb.select(col("vec_id"),
      Similarity.dotHof(col("embedding"), col("embedding")).as("d"))
    val optimized = df.queryExecution.optimizedPlan.toString
    assert(optimized.contains("fold_vec_dot"), optimized.take(500))
    assert(!optimized.contains("aggregate("), "HOF fold survived the rewrite")
    // bit-identical to a driver-side fold in the same index order
    val got = df.collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    val want = emb.select(col("vec_id"), col("embedding").cast("array<double>"))
      .as[(Long, Seq[Double])].collect()
      .map { case (id, v) => id -> v.foldLeft(0.0)((acc, x) => acc + x * x) }.toMap
    assert(got == want)
  }

  test("cosine HOF rewrites (3 kernels) and matches the native cosine") {
    val df = emb.select(
      Similarity.cosineHof(col("embedding"), col("embedding")).as("hof"),
      Similarity.cosine(col("embedding"), col("embedding")).as("native"))
    val optimized = df.queryExecution.optimizedPlan.toString
    assert("fold_vec_dot".r.findAllIn(optimized).size >= 3)
    assert(df.where(col("hof") =!= col("native")).count() == 0)
  }

  test("fold semantics preserved: length mismatch and null elements give NULL") {
    // RDD-backed so ConvertToLocalRelation can't fold the projection away
    // before the rewrite is observable in the optimized plan
    val rows = spark.sparkContext.parallelize(Seq(
      (1L, Seq[java.lang.Double](1.0, 2.0), Seq[java.lang.Double](3.0, 4.0)),
      (2L, Seq[java.lang.Double](1.0, 2.0), Seq[java.lang.Double](3.0)),
      (3L, Seq[java.lang.Double](1.0, null), Seq[java.lang.Double](3.0, 4.0))))
      .toDF("id", "a", "b")
    val out = rows.select(col("id"), Similarity.dotHof(col("a"), col("b")).as("d"))
    assert(out.queryExecution.optimizedPlan.toString.contains("fold_vec_dot"))
    val got = out.collect().map(r => r.getLong(0) ->
      (if (r.isNullAt(1)) null else r.getDouble(1))).toMap
    assert(got == Map(1L -> 11.0, 2L -> null, 3L -> null))
  }

  test("unrelated folds are left alone") {
    val df = emb.select(aggregate(col("embedding").cast("array<double>"),
      lit(1.0), (acc, x) => acc * x).as("prod"))
    assert(!df.queryExecution.optimizedPlan.toString.contains("fold_vec_dot"))
    df.collect()
  }
}
