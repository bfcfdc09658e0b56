package graft.functions

import org.apache.spark.sql.{Encoder, Encoders}
import org.apache.spark.sql.expressions.Aggregator

/** KMV (k-minimum-values) distinct-count sketch as a typed Aggregator:
  * per-group state is the k smallest DISTINCT 32-bit hash values seen —
  * O(k) regardless of group size, built map-side during partial
  * aggregation and merged by union+rebound, so only k longs per group
  * per partition ever reach the shuffle (the property that lets one
  * sketch a 100 TB column without a distinct shuffle; contrast the exact
  * count_distinct next to it in the q37 calibration query).
  *
  * Estimator: with hashes uniform on [0, 2³²), the k-th smallest value
  * v estimates the distinct count as (k−1)/(v/2³²) — the standard KMV
  * unbiased form (Bar-Yossef et al. 2002). Below k distinct values the
  * buffer IS the distinct set, so the exact size is returned. The
  * output is a pure function of the distinct hash set, so any
  * partial-aggregation schedule produces identical results — and the
  * DuckDB oracle can recompute it from the k-th order statistic.
  */
class KmvDistinctAggregator(k: Int)
  extends Aggregator[(String, Long), Seq[Long], Double] {
  require(k >= 2, "KMV needs k >= 2")

  // production note: a TreeSet buffer makes reduce O(log k); the Seq
  // form keeps the buffer encoder trivial and k is small
  private def bound(buf: Seq[Long]): Seq[Long] = buf.distinct.sorted.take(k)

  override def zero: Seq[Long] = Seq.empty

  override def reduce(buf: Seq[Long], in: (String, Long)): Seq[Long] = {
    val h = in._2
    if (buf.length == k && h >= buf.last) buf else bound(buf :+ h)
  }

  override def merge(a: Seq[Long], b: Seq[Long]): Seq[Long] = bound(a ++ b)

  override def finish(buf: Seq[Long]): Double =
    if (buf.length < k) buf.length.toDouble
    else (k - 1).toDouble * 4294967296.0 / buf.last.toDouble

  override def bufferEncoder: Encoder[Seq[Long]] =
    org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Seq[Long]]()
  override def outputEncoder: Encoder[Double] = Encoders.scalaDouble
}
