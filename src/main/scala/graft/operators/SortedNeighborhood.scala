package graft.operators

import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.functions.col
import org.apache.spark.sql.types.{IntegerType, StructField, StructType}

/** Sorted-neighborhood blocking (Hernández & Stolfo 1995) at cluster
  * scale: pair every row with its next `w` neighbors in a global sort
  * order WITHOUT a global-window `lead` — the sort-key domain is
  * corpus-sized (one row per distinct entity name), so
  * `lead(x, k).over(Window.orderBy(key))` would single-task the whole
  * dictionary, the exact cliff [[DistributedRank]] exists to remove.
  *
  * The production form documented on the q444 register row, implemented:
  *
  *   1. '''range partition''' by the sort key, sort within partitions,
  *      `localCheckpoint` (both passes below must see identical sampled
  *      ranges — the [[DistributedRank.prepare]] discipline);
  *   2. '''boundary overlap''': one bounded pass collects the FIRST `w`
  *      rows of every partition (≤ partitions × w rows on the driver,
  *      never data-sized) and broadcasts them;
  *   3. a map-side second pass slides a (w+1)-row buffer over each
  *      partition, extending the tail with the broadcast heads of the
  *      FOLLOWING partitions (a short partition contributes all its
  *      rows, so the continuation walks forward until `w` rows are
  *      gathered or the table ends) — every row meets exactly its `w`
  *      global sort successors, partition boundaries invisible.
  *
  * Output: for each input row and each of its 1..w successors, one row
  * with the input row's columns plus the successor's columns prefixed
  * `nb_` (rows at the corpus tail emit only their available successors —
  * the same rows a window `lead` would leave null and the caller would
  * drop). Deterministic iff `orderCols` is a UNIQUE key of `df` (ties
  * make neighbor identity order-dependent, same as the window form —
  * q444 guarantees uniqueness by grouping on the name first).
  *
  * SCALE: one range-partition shuffle + one bounded collect; candidate
  * mass is strictly w·n and each task emits only its own rows' pairs.
  */
object SortedNeighborhood {

  def pairs(df: DataFrame, orderCols: Seq[String], w: Int,
      partitions: Int = 0): DataFrame = {
    require(w >= 1, s"window w=$w must be >= 1")
    val spark = df.sparkSession
    val nParts = if (partitions > 0) partitions
      else spark.sessionState.conf.numShufflePartitions
    val ranged = df
      .repartitionByRange(nParts, orderCols.map(col): _*)
      .sortWithinPartitions(orderCols.map(col): _*)
      .localCheckpoint() // identical partitions for the head pass + pairing
    // bounded head collect: <= nParts * w rows
    val heads: Map[Int, Array[Row]] = ranged.rdd
      .mapPartitionsWithIndex { (pid, it) =>
        val h = it.take(w).toArray
        if (h.isEmpty) Iterator.empty else Iterator((pid, h))
      }.collect().toMap
    val maxPid = ranged.rdd.getNumPartitions
    val bc = spark.sparkContext.broadcast(heads)
    val outSchema = StructType(df.schema.fields ++
      df.schema.fields.map(f =>
        StructField(s"nb_${f.name}", f.dataType, nullable = true)) :+
      StructField("nb_off", IntegerType, nullable = false))
    val ww = w
    // the pairing pass indexes the broadcast heads by RANGED's partition
    // number, so it must receive the RDD's OWN split index — NOT
    // TaskContext.getPartitionId(), which is the final-RDD-of-the-task id
    // and is offset whenever a downstream union/coalesce renumbers task
    // partitions (q472 runs two passes under a union: the second child's
    // tasks saw pids shifted past maxPid and dropped every
    // cross-boundary pair)
    val pairRdd = ranged.rdd.mapPartitionsWithIndex { (pid, it) =>
      // continuation: first-w rows of the FOLLOWING partitions, in order —
      // never more than w rows are ever consumed from it
      val continuation = ((pid + 1) until maxPid).iterator
        .flatMap(p => bc.value.getOrElse(p, Array.empty[Row]).iterator)
        .take(ww)
      // tag local rows; continuation rows pair as neighbors only
      val tagged = it.map(r => (r, true)) ++ continuation.map(r => (r, false))
      val buf = scala.collection.mutable.Queue.empty[(Row, Boolean)]
      def drainFront(): Iterator[Row] = {
        val (front, isLocal) = buf.dequeue()
        if (!isLocal) Iterator.empty
        else buf.iterator.zipWithIndex.map { case ((nb, _), i) =>
          Row.fromSeq(front.toSeq ++ nb.toSeq ++ Seq(i + 1))
        }
      }
      new Iterator[Row] {
        private var pending: Iterator[Row] = Iterator.empty
        private def advance(): Unit = {
          while (!pending.hasNext &&
              (tagged.hasNext || buf.exists(_._2))) {
            while (tagged.hasNext && buf.size < ww + 1) buf.enqueue(tagged.next())
            if (buf.size == ww + 1 || !tagged.hasNext) pending = drainFront()
          }
        }
        def hasNext: Boolean = { advance(); pending.hasNext }
        def next(): Row = { advance(); pending.next() }
      }
    }
    spark.createDataFrame(pairRdd, outSchema)
  }
}
