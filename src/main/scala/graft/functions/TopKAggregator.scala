package graft.functions

import org.apache.spark.sql.{Encoder, Encoders}
import org.apache.spark.sql.expressions.Aggregator

/** Typed per-group top-k without a sort (SURVEY §2.8 stretch: a custom
  * `Aggregator[IN, BUF, OUT]`): each partition keeps a bounded buffer of
  * the k best (score, id) pairs, merge unions two buffers and re-bounds.
  *
  * Scale shape: state is O(k) per group regardless of group size, the
  * partial aggregation runs map-side, and only k pairs per group per
  * partition reach the shuffle — against a window row_number()<=k
  * formulation this replaces a full per-group sort with a running
  * bounded selection. Usable wherever `ds.groupByKey(...).agg(...)`
  * runs, batch or streaming.
  */
class TopKAggregator(k: Int)
  extends Aggregator[(Long, Double), Seq[(Double, Long)], Seq[(Double, Long)]] {

  // kept ascending-worst-first so bounding drops the minimum in O(k)
  private def bound(buf: Seq[(Double, Long)]): Seq[(Double, Long)] =
    buf.sortBy { case (s, id) => (-s, id) }.take(k)

  override def zero: Seq[(Double, Long)] = Seq.empty

  override def reduce(buf: Seq[(Double, Long)], in: (Long, Double)): Seq[(Double, Long)] = {
    val (id, score) = in
    if (buf.length < k) bound(buf :+ ((score, id)))
    else if (score > buf.last._1 || (score == buf.last._1 && id < buf.last._2))
      bound(buf.init :+ ((score, id)))
    else buf
  }

  override def merge(a: Seq[(Double, Long)], b: Seq[(Double, Long)]): Seq[(Double, Long)] =
    bound(a ++ b)

  override def finish(buf: Seq[(Double, Long)]): Seq[(Double, Long)] = bound(buf)

  override def bufferEncoder: Encoder[Seq[(Double, Long)]] =
    org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Seq[(Double, Long)]]()
  override def outputEncoder: Encoder[Seq[(Double, Long)]] =
    org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Seq[(Double, Long)]]()
}
