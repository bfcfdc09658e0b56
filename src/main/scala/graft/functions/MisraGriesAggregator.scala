package graft.functions

import org.apache.spark.sql.{Encoder, Encoders}
import org.apache.spark.sql.expressions.Aggregator

/** Misra-Gries heavy-hitter candidate sketch as a typed Aggregator:
  * per-group state is at most `c` (item, counter) pairs — O(c) regardless
  * of input size, built map-side during partial aggregation and merged
  * associatively, so only c pairs per partition reach the shuffle.
  *
  * Deterministic guarantee (the reason the q38 two-pass query is exactly
  * oracle-able): after any sequence of reduces and merges, every item
  * with true frequency > N/(c+1) is present in the summary (Misra &
  * Gries 1982; merge rule per Agarwal et al., "Mergeable Summaries",
  * PODS 2012 — sum counters, then subtract the (c+1)-th largest counter
  * from all and drop the non-positive). The summary CONTENT depends on
  * execution order, but the guaranteed-superset property does not —
  * pass 2 exact-counts the candidates and filters, so the final result
  * is the exact heavy-hitter set under every schedule.
  */
class MisraGriesAggregator(c: Int)
  extends Aggregator[String, (Map[String, Long], Long), (Seq[String], Long)] {
  require(c >= 1, "Misra-Gries needs capacity >= 1")

  // buffer = (MG counters, exact input count) — carrying N in the same
  // buffer fuses the sketch pass with the total-count pass, so the
  // two-pass heavy-hitter plan really is two scans, not three
  override def zero: (Map[String, Long], Long) = (Map.empty, 0L)

  override def reduce(buf: (Map[String, Long], Long), w: String): (Map[String, Long], Long) = {
    val m = buf._1.get(w) match {
      case Some(n) => buf._1.updated(w, n + 1)
      case None if buf._1.size < c => buf._1.updated(w, 1L)
      // full and w absent: decrement every counter (w's +1 and the -1
      // cancel), dropping zeros — the classic MG step
      case None => buf._1.view.mapValues(_ - 1).filter(_._2 > 0).toMap
    }
    (m, buf._2 + 1)
  }

  override def merge(a: (Map[String, Long], Long), b: (Map[String, Long], Long)): (Map[String, Long], Long) = {
    val m = (a._1.keySet ++ b._1.keySet).iterator
      .map(k => k -> (a._1.getOrElse(k, 0L) + b._1.getOrElse(k, 0L))).toMap
    val bounded =
      if (m.size <= c) m
      else {
        val d = m.values.toIndexedSeq.sorted(Ordering[Long].reverse)(c)
        m.view.mapValues(_ - d).filter(_._2 > 0).toMap
      }
    (bounded, a._2 + b._2)
  }

  override def finish(buf: (Map[String, Long], Long)): (Seq[String], Long) =
    (buf._1.keys.toSeq.sorted, buf._2)

  override def bufferEncoder: Encoder[(Map[String, Long], Long)] =
    org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[(Map[String, Long], Long)]()
  override def outputEncoder: Encoder[(Seq[String], Long)] =
    org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[(Seq[String], Long)]()
}
