package graft.functions

import org.apache.spark.sql.{Column, Encoder}
import org.apache.spark.sql.catalyst.encoders.ExpressionEncoder
import org.apache.spark.sql.expressions.Aggregator
import org.apache.spark.sql.functions.udaf

/** Bounded top-K aggregator WITH PAYLOAD — TopKAgg's missing half: real
  * top-k queries keep the id of what scored, not just the score. Input is
  * (score, id); the buffer holds at most k pairs on the map side, so the
  * exchange carries k pairs per (group, partition) instead of the whole
  * group — the row_number-window form this replaces shuffles and SORTS
  * every candidate row per key (the knn tail's dominant stage at scale).
  *
  * Total order: higher score wins, ties break toward the LOWER id —
  * exactly row_number() OVER (ORDER BY score DESC, id ASC), so swapping a
  * window for this aggregator is output-identical. finish() emits
  * best-first; posexplode of the result array yields (rank-1, struct).
  */
class TopKPairAgg(k: Int)
    extends Aggregator[(Double, Long), Array[(Double, Long)],
      Array[(Double, Long)]] with BoundedBufferAgg {

  // k boxed (Double, Long) tuples: ~48 B each with object headers
  override def maxBufferBytes: Long = 64L + 48L * k

  // NaN-safe score compare replicating Spark's DoubleType ordering
  // (nanSafeCompareDoubles): NaN ranks GREATEST and -0.0 == 0.0.
  // Primitive >/== are false both ways for NaN, so a NaN-scored pair
  // (e.g. dot/(0·nrm) on a zero-norm embedding) would otherwise rank
  // nondeterministically and break the claimed ≡ row_number output
  // identity. (java.lang.Double.compare is NOT a substitute: it orders
  // -0.0 < 0.0 where Spark's window ties them and falls to the id.)
  private def cmpScore(x: Double, y: Double): Int = {
    val xn = java.lang.Double.isNaN(x)
    val yn = java.lang.Double.isNaN(y)
    if ((xn && yn) || (x == y)) 0
    else if (xn) 1
    else if (yn) -1
    else if (x > y) 1
    else -1
  }

  private def beats(a: (Double, Long), b: (Double, Long)): Boolean = {
    val c = cmpScore(a._1, b._1)
    c > 0 || (c == 0 && a._2 < b._2)
  }

  override def zero: Array[(Double, Long)] = Array.empty

  override def reduce(buf: Array[(Double, Long)],
                      v: (Double, Long)): Array[(Double, Long)] =
    if (buf.length < k) buf :+ v
    else {
      // locate the WORST held pair; replace it iff v beats it
      var worst = 0
      var i = 1
      while (i < buf.length) {
        if (beats(buf(worst), buf(i))) worst = i
        i += 1
      }
      if (beats(v, buf(worst))) buf(worst) = v
      buf
    }

  override def merge(a: Array[(Double, Long)],
                     b: Array[(Double, Long)]): Array[(Double, Long)] = {
    val all = a ++ b
    if (all.length <= k) all
    else all.sortWith(beats).take(k)
  }

  override def finish(buf: Array[(Double, Long)]): Array[(Double, Long)] =
    buf.sortWith(beats)

  override def bufferEncoder: Encoder[Array[(Double, Long)]] =
    ExpressionEncoder()
  override def outputEncoder: Encoder[Array[(Double, Long)]] =
    ExpressionEncoder()
}

object TopKPairAgg {
  /** Aggregate expression: top-K (score DESC, id ASC) (score, id) pairs.
    * Output array element struct fields are `_1` (score) and `_2` (id).
    */
  def topK(score: Column, id: Column, k: Int): Column =
    udaf(new TopKPairAgg(k), ExpressionEncoder[(Double, Long)]())
      .apply(score, id)
}
