package graft.functions

import org.apache.spark.sql.{Column, Encoder}
import org.apache.spark.sql.catalyst.encoders.ExpressionEncoder
import org.apache.spark.sql.expressions.Aggregator
import org.apache.spark.sql.functions.udaf

/** Bounded DISTINCT min-K aggregator: the K smallest distinct longs per
  * group, ascending — `slice(sort_array(collect_set(x)), 1, K)` without
  * collect_set's unbounded buffer. The collect form ships EVERY distinct
  * value per (group, partition) through the shuffle and holds the full
  * set per live group in the object-agg hash map (the exact shape that
  * OOM'd the 1000x drug-disease pipeline, SCALE.md r11); this buffer
  * holds at most K longs, so map-side partials bound the shuffle to K
  * values per key and the BoundedAggFallback rule keeps the agg in hash
  * mode at any group count.
  *
  * Dedup happens on insert (O(K) contains scan — K is small by contract),
  * so the input does NOT need a distinct() pre-pass and its shuffle.
  */
class MinKDistinctAgg(k: Int)
    extends Aggregator[Long, Array[Long], Array[Long]] with BoundedBufferAgg {
  require(k >= 1, "k must be >= 1")

  // k longs + array header
  override def maxBufferBytes: Long = 64L + 8L * k

  override def zero: Array[Long] = Array.emptyLongArray

  override def reduce(buf: Array[Long], v: Long): Array[Long] =
    if (buf.contains(v)) buf
    else if (buf.length < k) buf :+ v
    else {
      var maxIdx = 0
      var i = 1
      while (i < buf.length) { if (buf(i) > buf(maxIdx)) maxIdx = i; i += 1 }
      if (v < buf(maxIdx)) buf(maxIdx) = v
      buf
    }

  override def merge(a: Array[Long], b: Array[Long]): Array[Long] =
    (a ++ b).distinct.sorted.take(k)

  override def finish(buf: Array[Long]): Array[Long] = buf.sorted

  override def bufferEncoder: Encoder[Array[Long]] = ExpressionEncoder()
  override def outputEncoder: Encoder[Array[Long]] = ExpressionEncoder()
}

object MinKDistinctAgg {
  /** K smallest distinct values of a long column, ascending. */
  def minK(values: Column, k: Int): Column = udaf(new MinKDistinctAgg(k)).apply(values)
}
