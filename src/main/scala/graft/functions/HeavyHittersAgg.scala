package graft.functions

import org.apache.spark.sql.{Column, Encoder}
import org.apache.spark.sql.catalyst.encoders.ExpressionEncoder
import org.apache.spark.sql.expressions.Aggregator
import org.apache.spark.sql.functions.udaf

/** Misra-Gries heavy-hitters sketch — the frequent-items sibling of
  * TopKAgg's bounded top-K: at most `k` counters in the buffer regardless
  * of stream length or cardinality, so the map side never materializes a
  * full value histogram (exact per-value counting of a hot column at
  * 100 TB is itself a scale hazard).
  *
  * Guarantee (the reason this sketch is usable despite approximation):
  * every item with true frequency > n/(k+1) is PRESENT in the summary, and
  * each reported count underestimates the true count by at most n/(k+1).
  * Counts are merge-order-dependent (so no byte-exact SQL oracle exists);
  * the containment guarantee itself is property-tested.
  *
  * Merge of two summaries follows Agarwal et al.'s mergeable-summaries
  * construction: add counts pointwise, then subtract the (k+1)-th largest
  * count from every entry and drop non-positives — the result keeps the
  * combined error bound.
  */
class HeavyHittersAgg(k: Int) extends Aggregator[String, Map[String, Long], Map[String, Long]]
    with BoundedBufferAgg {
  require(k >= 1, "k must be >= 1")

  // at most k map entries; 256 B/entry budgets the item string + boxing
  // (heavy-hitter items are tokens/ids, not documents)
  override def maxBufferBytes: Long = 64L + 256L * k

  override def zero: Map[String, Long] = Map.empty

  override def reduce(buf: Map[String, Long], x: String): Map[String, Long] =
    // skip nulls like the builtin aggregates do — a null map KEY would blow
    // up in the Catalyst map encoder at serialization time
    if (x == null) buf
    else buf.get(x) match {
      case Some(c) => buf.updated(x, c + 1)
      case None if buf.size < k => buf.updated(x, 1L)
      case None =>
        // classic MG step: decrement every counter, drop zeros
        buf.flatMap { case (i, c) => if (c > 1) Some(i -> (c - 1)) else None }
    }

  override def merge(a: Map[String, Long], b: Map[String, Long]): Map[String, Long] = {
    val combined = (a.keySet ++ b.keySet).iterator
      .map(i => i -> (a.getOrElse(i, 0L) + b.getOrElse(i, 0L))).toMap
    if (combined.size <= k) combined
    else {
      val dec = combined.values.toSeq.sorted(Ordering[Long].reverse).apply(k)
      combined.flatMap { case (i, c) => if (c > dec) Some(i -> (c - dec)) else None }
    }
  }

  override def finish(buf: Map[String, Long]): Map[String, Long] = buf

  override def bufferEncoder: Encoder[Map[String, Long]] = ExpressionEncoder()
  override def outputEncoder: Encoder[Map[String, Long]] = ExpressionEncoder()
}

object HeavyHittersAgg {
  /** Aggregate expression: MG-k candidate heavy hitters of a string column
    * as map<item, undercount>.
    */
  def heavyHitters(items: Column, k: Int): Column =
    udaf(new HeavyHittersAgg(k)).apply(items)
}
