package graft.functions

import org.apache.spark.sql.{Column, Encoder}
import org.apache.spark.sql.catalyst.encoders.ExpressionEncoder
import org.apache.spark.sql.expressions.Aggregator
import org.apache.spark.sql.functions.udaf

/** Bounded top-K aggregator (SURVEY UD2, §4 "manual: top-K truncation").
  *
  * `slice(sort_array(collect_list(x), desc), 1, K)` collects EVERY value
  * into the aggregation buffer and truncates only after the shuffle — per
  * group the exchange carries all N scores. This Aggregator keeps at most K
  * values in the buffer on the map side, so partial aggregation bounds the
  * shuffle to K doubles per (group, partition): the difference between
  * shipping 10^6 and 10^2 values per key at 100 TB.
  *
  * Buffer is an unsorted Array[Double] of <= k elements; inserts scan for
  * the min only when full (O(k) per displacing row); finish sorts
  * descending — output is identical to the collect+sort+slice form.
  */
class TopKAgg(k: Int) extends Aggregator[Double, Array[Double], Array[Double]]
    with BoundedBufferAgg {

  // k boxed-free doubles + array header
  override def maxBufferBytes: Long = 64L + 8L * k

  override def zero: Array[Double] = Array.emptyDoubleArray

  override def reduce(buf: Array[Double], v: Double): Array[Double] =
    if (buf.length < k) buf :+ v
    else {
      var minIdx = 0
      var i = 1
      while (i < buf.length) { if (buf(i) < buf(minIdx)) minIdx = i; i += 1 }
      if (v > buf(minIdx)) buf(minIdx) = v
      buf
    }

  override def merge(a: Array[Double], b: Array[Double]): Array[Double] = {
    val all = a ++ b
    if (all.length <= k) all
    else {
      java.util.Arrays.sort(all)
      all.takeRight(k)
    }
  }

  override def finish(buf: Array[Double]): Array[Double] =
    buf.sorted(Ordering[Double].reverse)

  override def bufferEncoder: Encoder[Array[Double]] = ExpressionEncoder()
  override def outputEncoder: Encoder[Array[Double]] = ExpressionEncoder()
}

object TopKAgg {
  /** Aggregate expression: top-K (descending) of a double column. */
  def topK(scores: Column, k: Int): Column = udaf(new TopKAgg(k)).apply(scores)
}
