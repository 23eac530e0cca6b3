package graft.plans

import org.apache.spark.rdd.RDD
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Ascending, Attribute, Expression, GenericInternalRow, JoinedRow, SortOrder, UnsafeProjection}
import org.apache.spark.sql.catalyst.plans.logical.{BinaryNode, LogicalPlan}
import org.apache.spark.sql.catalyst.plans.physical.{ClusteredDistribution, Distribution}
import org.apache.spark.sql.catalyst.util.TypeUtils
import org.apache.spark.sql.execution.{BinaryExecNode, SparkPlan, SparkStrategy}

/** Native backward as-of join (SURVEY §2.5 preference (c): custom
  * LogicalPlan + Strategy + SparkPlan, for the operator Spark lacks).
  *
  * Semantics match [[graft.operators.AsofJoin.backward]] (the composed
  * union+window form, which stays the DuckDB-oracle-checked reference):
  * every left row paired with the LATEST right row having the same key and
  * `right.ts <= left.ts`; right payload columns are null on no match.
  *
  * SCALE: declares ClusteredDistribution on the keys and (key, ts) child
  * orderings, so EnsureRequirements plans exactly one hash exchange + sort
  * per side (identical cost shape to a sort-merge join); the per-partition
  * merge then streams both sides once holding ONE buffered right row —
  * no window state, no unioned intermediate, ~2x less sorted data than the
  * composed form.
  */
case class AsOfJoinPlan(left: LogicalPlan, right: LogicalPlan,
    leftKey: Attribute, rightKey: Attribute,
    leftTs: Attribute, rightTs: Attribute) extends BinaryNode {
  /** all left columns + right payload (right minus key/ts), nullable. */
  override def output: Seq[Attribute] = left.output ++
    right.output.filterNot(a => a.exprId == rightKey.exprId || a.exprId == rightTs.exprId)
      .map(_.withNullability(true))
  override protected def withNewChildrenInternal(l: LogicalPlan, r: LogicalPlan): LogicalPlan =
    copy(left = l, right = r)
}

case class AsOfJoinExec(left: SparkPlan, right: SparkPlan,
    leftKey: Attribute, rightKey: Attribute,
    leftTs: Attribute, rightTs: Attribute,
    output: Seq[Attribute]) extends BinaryExecNode {

  override def requiredChildDistribution: Seq[Distribution] =
    ClusteredDistribution(Seq(leftKey)) :: ClusteredDistribution(Seq(rightKey)) :: Nil

  override def requiredChildOrdering: Seq[Seq[SortOrder]] = Seq(
    Seq(SortOrder(leftKey, Ascending), SortOrder(leftTs, Ascending)),
    Seq(SortOrder(rightKey, Ascending), SortOrder(rightTs, Ascending)))

  override def outputOrdering: Seq[SortOrder] =
    Seq(SortOrder(leftKey, Ascending), SortOrder(leftTs, Ascending))

  override protected def doExecute(): RDD[InternalRow] = {
    val keyType = leftKey.dataType
    val tsType = leftTs.dataType
    val rightWidth = right.output.size
    val lOut = left.output
    val rOut = right.output
    val out = output
    val lKeyIdx = lOut.indexWhere(_.exprId == leftKey.exprId)
    val lTsIdx = lOut.indexWhere(_.exprId == leftTs.exprId)
    val rKeyIdx = rOut.indexWhere(_.exprId == rightKey.exprId)
    val rTsIdx = rOut.indexWhere(_.exprId == rightTs.exprId)

    left.execute().zipPartitions(right.execute()) { (lIter, rIter) =>
      val keyOrd = TypeUtils.getInterpretedOrdering(keyType)
      val tsOrd = TypeUtils.getInterpretedOrdering(tsType)
      val project = UnsafeProjection.create(out, lOut ++ rOut)
      val joined = new JoinedRow
      val nullRight = new GenericInternalRow(rightWidth)
      val rBuf = rIter.buffered
      // last right row at-or-before the current scan position, per key
      var matchedKey: Any = null
      var matched: InternalRow = null

      lIter.map { lRow =>
        val lk = lRow.get(lKeyIdx, keyType)
        val lt = lRow.get(lTsIdx, tsType)
        // drain right rows that are <= (lk, lt) in (key, ts) order
        var advance = true
        while (advance && rBuf.hasNext) {
          val rk = rBuf.head.get(rKeyIdx, keyType)
          val kc = keyOrd.compare(rk.asInstanceOf[AnyRef], lk.asInstanceOf[AnyRef])
          if (kc < 0) { rBuf.next() } // right key behind: skip (no left rows for it remain)
          else if (kc == 0 &&
              tsOrd.compare(rBuf.head.get(rTsIdx, tsType).asInstanceOf[AnyRef],
                lt.asInstanceOf[AnyRef]) <= 0) {
            matched = rBuf.next().copy() // rows are reused buffers: copy
            matchedKey = rk
          } else advance = false
        }
        val m = if (matched != null &&
          keyOrd.compare(matchedKey.asInstanceOf[AnyRef], lk.asInstanceOf[AnyRef]) == 0)
          matched else nullRight
        project(joined(lRow, m))
      }
    }
  }

  override protected def withNewChildrenInternal(l: SparkPlan, r: SparkPlan): SparkPlan =
    copy(left = l, right = r)
}

object AsOfJoinStrategy extends SparkStrategy {
  override def apply(plan: LogicalPlan): Seq[SparkPlan] = plan match {
    case p: AsOfJoinPlan =>
      AsOfJoinExec(planLater(p.left), planLater(p.right),
        p.leftKey, p.rightKey, p.leftTs, p.rightTs, p.output) :: Nil
    case _ => Nil
  }
}
