package graft.operators

import org.apache.spark.sql.Encoder
import org.apache.spark.sql.catalyst.encoders.ExpressionEncoder
import org.apache.spark.sql.expressions.Aggregator

/** Distinct-count sketching (custom UDAF surface).
  *
  * `approx_count_distinct` (q33) is the production HLL path, but its
  * register layout is engine-specific, so it can never hash-match a DuckDB
  * oracle. KMV (k-minimum-values, Bar-Yossef et al. 2002) is the
  * deterministic alternative: over a fixed hash the k smallest distinct
  * hash values — and therefore the estimate — are a pure FUNCTION of the
  * input set, independent of partitioning, merge order, or engine. With
  * the engine-portable 60-bit truncated-md5 hash (same construction q62
  * uses) the whole sketch is reproducible in SQL on any engine.
  *
  * SCALE: the buffer is k longs, reduce/merge are O(k) trims, partial
  * aggregation applies — each map task ships one k-entry buffer per group,
  * never the group's values.
  */
object Sketches {

  /** KMV estimator: exact count when fewer than k distinct hashes exist,
    * else (k-1) * 2^60 / h_k with h_k the k-th smallest distinct hash
    * (hash domain [0, 2^60) — the uniform-order-statistic estimator). */
  def kmvDistinct(k: Int): Aggregator[Long, Seq[Long], Double] =
    new Aggregator[Long, Seq[Long], Double] {
      private def trim(s: Seq[Long]): Seq[Long] = s.distinct.sorted.take(k)
      override def zero: Seq[Long] = Seq.empty
      // buffer invariant: sorted ascending, distinct, size <= k. The
      // overwhelmingly common case (full buffer, h above the k-th
      // minimum) is a single comparison — no sort, no allocation; an
      // accepted hash pays one O(k) insert copy.
      override def reduce(buf: Seq[Long], h: Long): Seq[Long] = {
        if (buf.size == k && h >= buf.last) buf
        else {
          val i = buf.indexWhere(_ >= h)
          if (i == -1) buf :+ h // buf.size < k here
          else if (buf(i) == h) buf
          else ((buf.take(i) :+ h) ++ buf.drop(i)).take(k)
        }
      }
      override def merge(a: Seq[Long], b: Seq[Long]): Seq[Long] = trim(a ++ b)
      override def finish(buf: Seq[Long]): Double =
        if (buf.size < k) buf.size.toDouble
        else (k - 1).toDouble * 1152921504606846976.0 / buf.last
      override def bufferEncoder: Encoder[Seq[Long]] = ExpressionEncoder[Seq[Long]]()
      override def outputEncoder: Encoder[Double] = ExpressionEncoder[Double]()
    }
}
