package graft.operators

import org.apache.spark.sql.Dataset

/** Helpers for iterative driver loops over eagerly localCheckpoint'd
  * DataFrames (connected components, PageRank, BPE training).
  *
  * Each round of such a loop checkpoints its new iterate; the previous
  * round's blocks are dead the moment the new one is materialized, but
  * nothing frees them until the ContextCleaner notices the RDD is
  * unreferenced — GC-timing-dependent, so a 100-iteration production run
  * can hold O(rounds) block sets hostage. These helpers release the blocks
  * deterministically.
  */
private[graft] object IterUtils {

  /** Drop the persisted blocks behind an eagerly `localCheckpoint()`'d
    * frame. Only call this on frames produced DIRECTLY by
    * `df.localCheckpoint()` (whose analyzed plan is the single
    * `LogicalRDD` leaf holding the persisted RDD), and only once every
    * downstream consumer has either materialized its own checkpoint or
    * finished its action — after this the frame can no longer be
    * recomputed. Non-blocking: the executors free blocks asynchronously.
    */
  def unpersistCheckpoint(df: Dataset[_]): Unit =
    df.queryExecution.analyzed.foreach {
      case l: org.apache.spark.sql.execution.LogicalRDD =>
        l.rdd.unpersist(blocking = false)
      case _ => ()
    }
}
