package graft.functions

import org.apache.spark.sql.{Column, Encoder}
import org.apache.spark.sql.catalyst.encoders.ExpressionEncoder
import org.apache.spark.sql.expressions.Aggregator
import org.apache.spark.sql.functions.udaf

/** Histogram-sketch quantiles: a mergeable, DETERMINISTIC quantile summary.
  *
  * Exact `percentile` sorts every group value (the whole group transits the
  * shuffle); approx_percentile's GK sketch is bounded but merge-order-
  * sensitive, so no cross-engine oracle can pin it. This aggregator buckets
  * values at a fixed `width` into a sparse count map — the buffer is bounded
  * by the value RANGE / width (not the row count), partial aggregation
  * combines map-side, merge is pointwise addition (associative and
  * commutative → deterministic under any partitioning), and the quantile
  * interpolates linearly inside the crossing bucket. Resolution is the
  * knob: error <= width/2, memory = O(range/width) counters.
  *
  * finish emits one interpolated estimate per requested q, in order —
  * element_at unpacks them into columns.
  */
class HistQuantileAgg(width: Double, qs: Seq[Double])
    extends Aggregator[Double, Map[Long, Long], Array[Double]]
    with BoundedBufferAgg {
  require(width > 0, "width must be > 0")
  require(qs.nonEmpty && qs.forall(q => q > 0 && q <= 1), "qs in (0, 1]")

  // The bin map grows with the occupied VALUE RANGE / width — data-domain
  // bounded, not construction-bounded, until the bin index is clamped.
  // Saturating at fixed edges ±MaxAbsBin keeps merge deterministic (the
  // clamp is per-value, independent of scan/merge order) and makes the
  // buffer bounded by construction: quantiles are exact-to-width inside
  // ±width·2^20 and saturate to the edge outside it. The worst-case bound
  // is still ~200 MB, so the fallback rule's byte budget keeps grouped
  // hist aggs on the stock spill-safe exec — the clamp bounds the DAMAGE,
  // the budget keeps the threshold honest.
  override def maxBufferBytes: Long =
    64L + 100L * (2L * HistQuantileAgg.MaxAbsBin + 1L)

  override def zero: Map[Long, Long] = Map.empty

  override def reduce(buf: Map[Long, Long], x: Double): Map[Long, Long] = {
    val raw = math.floor(x / width).toLong
    val b = math.max(-HistQuantileAgg.MaxAbsBin,
      math.min(HistQuantileAgg.MaxAbsBin, raw))
    buf.updated(b, buf.getOrElse(b, 0L) + 1)
  }

  override def merge(a: Map[Long, Long], b: Map[Long, Long]): Map[Long, Long] =
    (a.keySet ++ b.keySet).iterator
      .map(k => k -> (a.getOrElse(k, 0L) + b.getOrElse(k, 0L))).toMap

  override def finish(buf: Map[Long, Long]): Array[Double] = {
    val n = buf.valuesIterator.sum
    if (n == 0L) Array.empty
    else {
      val sorted = buf.toArray.sortBy(_._1)
      qs.iterator.map { q =>
        // rank stays DOUBLE through the interpolation so the SQL twin
        // (ceil returns double there too) computes bit-identical estimates
        val rank = math.ceil(q * n)
        var cum = 0L
        var i = 0
        while (i < sorted.length && cum + sorted(i)._2 < rank) {
          cum += sorted(i)._2; i += 1
        }
        val (bucket, c) = sorted(i)
        bucket * width + width * (rank - cum) / c
      }.toArray
    }
  }

  override def bufferEncoder: Encoder[Map[Long, Long]] = ExpressionEncoder()
  override def outputEncoder: Encoder[Array[Double]] = ExpressionEncoder()
}

object HistQuantileAgg {
  /** Saturation edge for bin indices: values beyond ±width·2^20 land in
    * the edge bins. Far above every fixture's range (l_extendedprice/100
    * occupies ~1k bins) so current oracles are untouched.
    */
  val MaxAbsBin: Long = 1L << 20

  /** Aggregate expression: interpolated quantile estimates (one array slot
    * per q, in order) of a double column at histogram resolution `width`.
    */
  def histQuantiles(values: Column, width: Double, qs: Seq[Double]): Column =
    udaf(new HistQuantileAgg(width, qs)).apply(values)
}

/** Bottom-k-by-hash sample: k rows with the smallest deterministic hash per
  * group — the distributed equivalent of per-group reservoir sampling, but
  * REPRODUCIBLE: membership depends only on the hash, never on scan or
  * merge order (an RNG reservoir differs run to run and engine to engine).
  *
  * The buffer holds at most k (hash, id) pairs; partial aggregation bounds
  * the shuffle to k pairs per (group, partition) exactly like TopKAgg. The
  * same sketch doubles as a KMV cardinality estimator and as consistent
  * downsampling: at 100 TB "give me a uniform 1k-doc sample per language"
  * must not collect the group.
  */
class BottomKAgg(k: Int)
    extends Aggregator[(Long, String), Array[(Long, String)], Array[String]]
    with BoundedBufferAgg {
  require(k >= 1, "k must be >= 1")

  // k (hash, id) pairs; 192 B/entry budgets the id string + tuple boxing
  override def maxBufferBytes: Long = 64L + 192L * k

  private val ord = Ordering.Tuple2[Long, String]

  override def zero: Array[(Long, String)] = Array.empty

  override def reduce(buf: Array[(Long, String)],
                      v: (Long, String)): Array[(Long, String)] =
    if (buf.length < k) buf :+ v
    else {
      var maxIdx = 0
      var i = 1
      while (i < buf.length) { if (ord.gt(buf(i), buf(maxIdx))) maxIdx = i; i += 1 }
      if (ord.lt(v, buf(maxIdx))) buf(maxIdx) = v
      buf
    }

  override def merge(a: Array[(Long, String)],
                     b: Array[(Long, String)]): Array[(Long, String)] = {
    val all = a ++ b
    if (all.length <= k) all else all.sorted(ord).take(k)
  }

  override def finish(buf: Array[(Long, String)]): Array[String] =
    buf.sorted(ord).map(_._2)

  override def bufferEncoder: Encoder[Array[(Long, String)]] = ExpressionEncoder()
  override def outputEncoder: Encoder[Array[String]] = ExpressionEncoder()
}

object BottomKAgg {
  /** Aggregate expression: ids of the k smallest (hash, id) pairs, hash
    * order. Tuple-input aggregators take their fields as separate
    * arguments: (hash long, id string).
    */
  def bottomK(hash: Column, id: Column, k: Int): Column =
    udaf(new BottomKAgg(k), ExpressionEncoder[(Long, String)]()).apply(hash, id)
}

/** KMV (k-minimum-values) distinct-count sketch (Bar-Yossef et al.
  * RANDOM'02; Beyer et al. SIGMOD'07): the k smallest DISTINCT hash values
  * seen by a group. This is the bounded-state sibling of the exact bitmap
  * in q_etl_sketch_rollup — that sketch's size tracks the NDV, this one is
  * k longs no matter how large the group. Partial aggregation combines
  * map-side, and merge is LOSSLESS: the k smallest distinct values of a
  * union are a pure function of the per-part k smallest, so a rollup over
  * merged sketches equals the sketch built directly from the union —
  * bit-for-bit, which is what lets a cross-engine oracle pin it. The
  * estimator ((k−1)·H / kth, H = hash range) is applied declaratively
  * downstream; when the sketch isn't full the count is exact.
  *
  * BottomKAgg deliberately keeps duplicate hashes (it samples ROWS); KMV
  * must dedupe (it estimates DISTINCT values), hence its own buffer.
  */
class KmvAgg(k: Int) extends Aggregator[Long, Array[Long], Array[Long]]
    with BoundedBufferAgg {
  require(k >= 1, "k must be >= 1")

  // k longs + array header
  override def maxBufferBytes: Long = 64L + 8L * k

  override def zero: Array[Long] = Array.empty

  // buffer invariant: sorted ascending, distinct, length <= k
  override def reduce(buf: Array[Long], h: Long): Array[Long] = {
    val pos = java.util.Arrays.binarySearch(buf, h)
    if (pos >= 0) buf // already present
    else {
      val ins = -pos - 1
      if (buf.length < k) {
        val out = new Array[Long](buf.length + 1)
        System.arraycopy(buf, 0, out, 0, ins)
        out(ins) = h
        System.arraycopy(buf, ins, out, ins + 1, buf.length - ins)
        out
      } else if (ins >= k) buf // larger than the current kth — outside the sketch
      else {
        val out = new Array[Long](k)
        System.arraycopy(buf, 0, out, 0, ins)
        out(ins) = h
        System.arraycopy(buf, ins, out, ins + 1, k - ins - 1)
        out
      }
    }
  }

  override def merge(a: Array[Long], b: Array[Long]): Array[Long] =
    (a ++ b).distinct.sorted.take(k)

  override def finish(buf: Array[Long]): Array[Long] = buf

  override def bufferEncoder: Encoder[Array[Long]] = ExpressionEncoder()
  override def outputEncoder: Encoder[Array[Long]] = ExpressionEncoder()
}

object KmvAgg {
  /** Aggregate expression: the group's KMV sketch (sorted ascending array
    * of its k smallest distinct hash values).
    */
  def kmv(hash: Column, k: Int): Column = udaf(new KmvAgg(k)).apply(hash)
}
