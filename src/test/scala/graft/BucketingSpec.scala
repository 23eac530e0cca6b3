package graft

import org.apache.spark.sql.functions._

/** Bucketed co-located joins: pre-bucketing both fact tables on the join key
  * removes the per-query exchange entirely — the 100 TB answer to repeated
  * orders⋈lineitem joins (SURVEY §4 / DESIGN scale decisions). */
class BucketingSpec extends GraftSpec {

  test("bucketed join plans without an Exchange") {
    val db = "graft_bucketing"
    spark.sql(s"CREATE DATABASE IF NOT EXISTS $db")
    spark.sql(s"USE $db")
    try {
      spark.read.parquet(s"$sf0001/orders.parquet")
        .write.mode("overwrite").bucketBy(4, "o_orderkey").sortBy("o_orderkey")
        .saveAsTable("orders_b")
      spark.read.parquet(s"$sf0001/lineitem.parquet")
        .write.mode("overwrite").bucketBy(4, "l_orderkey").sortBy("l_orderkey")
        .saveAsTable("lineitem_b")
      val joined = spark.table("orders_b")
        .join(spark.table("lineitem_b"),
          col("o_orderkey") === col("l_orderkey"))
        .groupBy("o_orderpriority")
        .agg(sum("l_quantity").as("q"))
      val plan = joined.queryExecution.executedPlan.toString
      // the join itself must need no shuffle: the only exchange allowed is
      // the final single-partition aggregation
      val exchanges = "Exchange hashpartitioning".r.findAllIn(plan).toSeq
      assert(exchanges.size <= 1, plan)
      assert(!plan.contains("Exchange hashpartitioning(o_orderkey") &&
        !plan.contains("Exchange hashpartitioning(l_orderkey"), plan)
      // and the result matches the unbucketed join
      val want = spark.read.parquet(s"$sf0001/orders.parquet")
        .join(spark.read.parquet(s"$sf0001/lineitem.parquet"),
          col("o_orderkey") === col("l_orderkey"))
        .groupBy("o_orderpriority").agg(sum("l_quantity").as("q"))
        .collect().map(r => r.getString(0) -> r.getDouble(1)).toMap
      val got = joined.collect().map(r => r.getString(0) -> r.getDouble(1)).toMap
      assert(got.keySet == want.keySet)
      got.foreach { case (k, v) => assert(math.abs(v - want(k)) < 1e-6) }
    } finally {
      spark.sql(s"DROP DATABASE IF EXISTS $db CASCADE")
      spark.sql("USE default")
    }
  }
}
