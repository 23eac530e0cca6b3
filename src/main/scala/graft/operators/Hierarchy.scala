package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Transitive-closure operators over child→parent edge frames (the CPC
  * scheme hierarchy, SURVEY §1.1 / §7.4 risk 5).
  *
  * Spark has no recursive CTE in the DataFrame API, so ancestors are
  * computed by iterative self-join with a depth cap (CPC depth <= ~15).
  *
  * SCALE: each iteration is one broadcast-or-shuffle join of the frontier
  * against the edge dim; the frontier shrinks as paths terminate. For a true
  * dimension-sized hierarchy the edges broadcast and the loop is
  * shuffle-free; checkpoint every few iterations on deep graphs to cut
  * lineage growth.
  */
object Hierarchy {

  /** All (symbol, ancestor, depth) paths, depth starting at 1 = parent.
    * Assumes an acyclic hierarchy; `maxDepth` caps runaway input cycles. */
  def ancestors(edges: DataFrame, maxDepth: Int = 20): DataFrame = {
    val ed = broadcast(edges.select(col("symbol"), col("parent_symbol")))
    var frontier = ed.select(col("symbol"), col("parent_symbol").as("ancestor"),
      lit(1L).as("depth"))
    var acc = frontier
    var depth = 1
    var done = false
    while (depth < maxDepth && !done) {
      val next = frontier.as("f")
        .join(ed.as("e"), col("f.ancestor") === col("e.symbol"))
        .select(col("f.symbol"), col("e.parent_symbol").as("ancestor"),
          (col("f.depth") + 1L).as("depth"))
      // one small action per level bounds the loop without a fixed guess
      if (next.isEmpty) done = true
      else { acc = acc.unionByName(next); frontier = next; depth += 1 }
    }
    acc
  }
}
