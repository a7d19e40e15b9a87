package graft.functions

import org.apache.spark.sql.Encoder
import org.apache.spark.sql.catalyst.encoders.ExpressionEncoder
import org.apache.spark.sql.expressions.Aggregator

/** Per-group top-k as a typed, mergeable [[Aggregator]].
  *
  * Each partial buffer holds at most k (score, id) pairs, so a
  * 1000-executor aggregation ships k rows per group per partition
  * instead of the whole group — the scale-correct alternative to
  * `row_number().over(...)` + filter, which must sort entire
  * partitions. Ordering is (score desc, id asc) so ties are
  * deterministic.
  */
final class TopKAggregator(k: Int)
    extends Aggregator[(Double, Long), Seq[(Double, Long)], Seq[Long]] {

  private def ord: Ordering[(Double, Long)] =
    Ordering.by[(Double, Long), (Double, Long)] { case (s, id) => (-s, id) }

  override def zero: Seq[(Double, Long)] = Seq.empty

  // The buffer is kept sorted by `ord` as an invariant, so the per-row
  // path is an O(k) bounded insertion (usually a single comparison
  // against the current worst), not a re-sort of the buffer per row.
  override def reduce(buf: Seq[(Double, Long)],
      in: (Double, Long)): Seq[(Double, Long)] =
    if (buf.length == k && ord.gteq(in, buf.last)) buf
    else {
      val i = buf.indexWhere(e => ord.lt(in, e))
      val pos = if (i < 0) buf.length else i
      ((buf.take(pos) :+ in) ++ buf.drop(pos)).take(k)
    }

  override def merge(a: Seq[(Double, Long)],
      b: Seq[(Double, Long)]): Seq[(Double, Long)] =
    (a ++ b).sorted(ord).take(k)

  override def finish(buf: Seq[(Double, Long)]): Seq[Long] =
    buf.map(_._2)

  override def bufferEncoder: Encoder[Seq[(Double, Long)]] =
    ExpressionEncoder[Seq[(Double, Long)]]()

  override def outputEncoder: Encoder[Seq[Long]] =
    ExpressionEncoder[Seq[Long]]()
}
