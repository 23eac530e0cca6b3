package graft

import graft.operators.GraphOps
import org.apache.spark.sql.functions._

/** Behavioral checks for the session-6 graph operators (q428 SCC, q432
  * maximum spanning backbone): invariants the hash-compare can't
  * express — mutual-reachability closure on a hand graph, forest
  * structure (acyclicity, edge count, component spanning), and
  * exchange-argument maximality of the chosen backbone.
  */
class Session6OpsSpec extends GraftSpec {
  import spark.implicits._

  test("scc: hand graph resolves its cycles, bridge stays directed, labels are min ids") {
    // 1 <-> 2 (cycle), 3 <-> 4 (cycle), 2 -> 3 (one-way bridge), 5 isolated-ish (5 -> 1)
    val edges = Seq((1L, 2L), (2L, 1L), (3L, 4L), (4L, 3L), (2L, 3L),
      (5L, 1L)).toDF("src", "dst")
    val got = GraphOps.scc(edges, rounds = 4).collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2))).toMap
    assert(got(1L) == (1L, 2L) && got(2L) == (1L, 2L),
      s"cycle {1,2} should be one SCC labeled 1: $got")
    assert(got(3L) == (3L, 2L) && got(4L) == (3L, 2L),
      s"cycle {3,4} should be one SCC labeled 3: $got")
    assert(got(5L) == (5L, 1L), s"5 has no return path: $got")
  }

  test("maxSpanningForest: spans, is acyclic, and no non-tree edge can improve it (exchange argument)") {
    val edges = Seq(
      (1L, 2L, 10L), (2L, 3L, 9L), (1L, 3L, 2L),
      (3L, 4L, 8L), (2L, 4L, 1L), (4L, 5L, 7L), (1L, 5L, 7L))
      .toDF("a", "b", "w")
    val forest = GraphOps.maxSpanningForest(edges, rounds = 4).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    val nodes = Set(1L, 2L, 3L, 4L, 5L)
    assert(forest.length == nodes.size - 1,
      s"spanning tree of 5 nodes needs 4 edges: ${forest.toSeq}")
    // acyclic + spanning via union-find
    val parent = scala.collection.mutable.Map(nodes.map(n => n -> n).toSeq: _*)
    def find(x: Long): Long =
      if (parent(x) == x) x else { val r = find(parent(x)); parent(x) = r; r }
    forest.foreach { case (a, b, _) =>
      assert(find(a) != find(b), s"cycle via ($a,$b): ${forest.toSeq}")
      parent(find(a)) = find(b)
    }
    assert(nodes.map(find).size == 1, "forest does not span")
    // ties broken on (w desc, a, b): 4-5 (7) beats 1-5 (7) only through
    // the total order; the chosen set must contain the heavier uniques
    val chosen = forest.map(t => (t._1, t._2)).toSet
    assert(chosen.contains((1L, 2L)) && chosen.contains((2L, 3L)) &&
      chosen.contains((3L, 4L)), s"heavy spine missing: ${forest.toSeq}")
    // exchange argument: adding any non-tree edge closes a cycle whose
    // minimum tree edge is >= the added edge's weight (else not maximal)
    val treeAdj = forest.flatMap { case (a, b, w) =>
      Seq(a -> (b, w), b -> (a, w)) }
      .groupBy(_._1).map { case (k, v) => k -> v.map(_._2) }
    def pathMinW(from: Long, to: Long, seen: Set[Long]): Option[Long] =
      if (from == to) Some(Long.MaxValue)
      else treeAdj.getOrElse(from, Array.empty[(Long, Long)])
        .filterNot(e => seen(e._1)).flatMap { case (nxt, w) =>
          pathMinW(nxt, to, seen + from).map(math.min(_, w))
        }.reduceOption(_ max _)
    val all = Seq((1L, 2L, 10L), (2L, 3L, 9L), (1L, 3L, 2L),
      (3L, 4L, 8L), (2L, 4L, 1L), (4L, 5L, 7L), (1L, 5L, 7L))
    all.filterNot(e => chosen.contains((e._1, e._2))).foreach {
      case (a, b, w) =>
        val minOnPath = pathMinW(a, b, Set.empty).get
        assert(minOnPath >= w,
          s"swapping ($a,$b,$w) for a lighter tree edge ($minOnPath) would improve the forest")
    }
  }
}
