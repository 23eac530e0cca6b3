package graft

import org.apache.spark.sql.functions._

/** Round-16 operators: the incremental-components sidecar's
  * manifest-commit crash window, the DistributedRank key-type guard,
  * and the sorted-neighborhood range-partitioned pairing. */
class Round16OpsSpec extends GraftSpec {
  import spark.implicits._

  test("incrementalComponents: a crashed maintenance batch is invisible until its manifest publishes") {
    import graft.operators.{Dedup, Incremental}
    val root = java.nio.file.Files.createTempDirectory("graft-r16-cc")
      .resolve("state").toString
    def batch(pairs: (Long, Long)*): org.apache.spark.sql.DataFrame =
      pairs.toSeq.toDF("id_a", "id_b")
    def state(): Seq[(Long, Long)] = Incremental.readComponents(spark, root)
      .select("id", "cluster").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSeq.sorted
    Incremental.incrementalComponents(spark, root, batch((1L, 2L), (5L, 6L)))
    val committed = state()
    assert(committed == Seq((1L, 1L), (2L, 1L), (5L, 5L), (6L, 5L)))
    // simulate a maintenance batch killed BETWEEN the relabel write and
    // manifest publication: a txn dir full of half-relabeled rows lands
    // under data/ but no manifest version references it
    val crashedTxn = new java.io.File(root, "data/txn-crashed-dead")
    Seq((1L, 999L), (2L, 999L), (5L, 999L), (6L, 999L))
      .toDF("id", "cluster")
      .withColumn("bucket", pmod(col("id"), lit(16L)).cast("int"))
      .write.partitionBy("bucket").parquet(crashedTxn.toString)
    assert(state() == committed,
      "an unpublished txn dir must never be visible as history")
    // the NEXT batch reads the intact snapshot and commits on top of it
    Incremental.incrementalComponents(spark, root, batch((2L, 5L)))
    assert(state() == Seq((1L, 1L), (2L, 1L), (5L, 1L), (6L, 1L)))
    val twin = Dedup.duplicateClusters(
        batch((1L, 2L), (5L, 6L), (2L, 5L)))
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSeq.sorted
    assert(state() == twin)
  }
}
