package graft.operators

import org.apache.spark.sql.Encoder
import org.apache.spark.sql.catalyst.encoders.ExpressionEncoder
import org.apache.spark.sql.expressions.Aggregator

/** Typed per-group top-k aggregator (custom UDAF surface, SURVEY §2.10):
  * keeps a bounded buffer of the k largest (score, payload) pairs per group
  * — the per-key analog of TakeOrderedAndProject, without sorting whole
  * groups.
  *
  * SCALE: the buffer is size-bounded (k entries), merges are k-way list
  * merges, and partial aggregation applies — so per-group top-k over 100 TB
  * shuffles only k rows per group per map task, not the group contents.
  */
object TopK {

  /** k largest by score; returns payloads ordered best-first,
    * deterministic tie-break on payload. */
  def topKByScore(k: Int): Aggregator[(Double, Long), Seq[(Double, Long)], Seq[Long]] =
    new Aggregator[(Double, Long), Seq[(Double, Long)], Seq[Long]] {
      private def trim(s: Seq[(Double, Long)]) =
        s.sortBy { case (score, id) => (-score, id) }.take(k)
      override def zero: Seq[(Double, Long)] = Seq.empty
      override def reduce(buf: Seq[(Double, Long)], in: (Double, Long)) = trim(buf :+ in)
      override def merge(a: Seq[(Double, Long)], b: Seq[(Double, Long)]) = trim(a ++ b)
      override def finish(buf: Seq[(Double, Long)]): Seq[Long] = buf.map(_._2)
      override def bufferEncoder: Encoder[Seq[(Double, Long)]] =
        ExpressionEncoder[Seq[(Double, Long)]]()
      override def outputEncoder: Encoder[Seq[Long]] = ExpressionEncoder[Seq[Long]]()
    }
}
