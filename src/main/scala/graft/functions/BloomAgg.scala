package graft.functions

import org.apache.spark.sql.{Column, Encoder}
import org.apache.spark.sql.catalyst.encoders.ExpressionEncoder
import org.apache.spark.sql.expressions.Aggregator
import org.apache.spark.sql.functions.udaf

/** Bloom-filter bitset aggregator (mergeable sketch, SURVEY §2.9 family).
  *
  * Input is the PRE-HASHED key — a (h1, h2) pair of xxhash64 columns
  * computed by `ops.Bloom` — so the membership test on the probe side can
  * reproduce the exact same bit positions with codegen'd built-ins
  * (xxhash64 + pmod), no UDF on the hot path. Double hashing (Kirsch &
  * Mitzenmacher): bit_i = (b1 + i*b2) mod m, with b1/b2 reduced to
  * [0, 2^31) so the index arithmetic can never overflow a long even under
  * ANSI mode (k * 2^31 << 2^63).
  *
  * Scale shape: each map-side partial is one m-bit array regardless of row
  * count, and merge is a word-wise OR — the shuffle for a billion-key build
  * ships nPartitions bitsets, not a billion positions. The finished bitset
  * is a single row of m/8 bytes, broadcast-able even when the source side
  * is far too big for a broadcast-hash join relation.
  */
class BloomAgg(mBits: Int, k: Int)
  extends Aggregator[(Long, Long), Array[Long], Array[Long]]
  with BoundedBufferAgg {

  require(mBits > 0 && mBits % 64 == 0, s"mBits must be a positive multiple of 64: $mBits")
  require(k > 0, s"k must be positive: $k")
  private val nWords = mBits / 64

  // one m-bit word array — "bounded" can still be 128 MB at mBits = 2^30,
  // so the fallback rule's byte budget (not the marker alone) decides: a
  // grouped wide-bloom agg computes a threshold BELOW Spark's default and
  // keeps the stock spill-safe exec (current call sites are all global)
  override def maxBufferBytes: Long = 64L + 8L * nWords

  override def zero: Array[Long] = new Array[Long](nWords)

  override def reduce(buf: Array[Long], h: (Long, Long)): Array[Long] = {
    val b1 = java.lang.Math.floorMod(h._1, BloomAgg.HashRange)
    val b2 = java.lang.Math.floorMod(h._2, BloomAgg.HashRange)
    var i = 0
    while (i < k) {
      val pos = ((b1 + i * b2) % mBits).toInt
      buf(pos >>> 6) |= 1L << (pos & 63)
      i += 1
    }
    buf
  }

  override def merge(a: Array[Long], b: Array[Long]): Array[Long] = {
    var i = 0
    while (i < nWords) { a(i) |= b(i); i += 1 }
    a
  }

  override def finish(buf: Array[Long]): Array[Long] = buf

  override def bufferEncoder: Encoder[Array[Long]] = ExpressionEncoder()
  override def outputEncoder: Encoder[Array[Long]] = ExpressionEncoder()
}

object BloomAgg {
  /** Hash values are reduced mod 2^31 before position arithmetic. */
  val HashRange: Long = 1L << 31

  /** Aggregate expression over (h1, h2) hash columns → bitset array<long>. */
  def bloom(h1: Column, h2: Column, mBits: Int, k: Int): Column = {
    implicit val enc: Encoder[(Long, Long)] = ExpressionEncoder()
    udaf(new BloomAgg(mBits, k)).apply(h1, h2)
  }
}
