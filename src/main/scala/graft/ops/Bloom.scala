package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{ByteType, DataType, IntegerType, LongType, ShortType}
import graft.functions.BloomAgg

/** Bloom-filter semi-join reduction: build a bitset over the SMALL side's
  * join keys, broadcast it (one row of m/8 bytes), and pre-filter the BIG
  * side before its shuffle. Blooms have no false negatives, so the exact
  * join after the filter returns exactly the plain join's rows — the filter
  * only deletes rows that could never match, BEFORE they pay the exchange.
  *
  * 100 TB rationale: a selective dim that is still too wide/large to
  * broadcast as a hash relation forces a full fact shuffle; its key bloom
  * is KBs–MBs at any dim size (m bits total, not per key), so the fact
  * side drops non-matching rows at the scan and the exchange carries only
  * survivors. This is the semi-join reduction Spark's runtime row-level
  * filtering injects opportunistically, made explicit, tunable (fpp, k),
  * and composable with any downstream join strategy. Both the build and
  * the probe hash with codegen'd xxhash64; the probe predicate is pure
  * built-ins (pmod + element_at + bit ops) and stays inside
  * whole-stage codegen.
  */
object Bloom {

  private val Salt = "graft_bloom"

  /** Bits for a target false-positive rate at `n` keys, rounded up to a
    * whole number of words: m = -n ln(p) / ln(2)^2.
    */
  def bitsFor(n: Long, fpp: Double): Int = {
    require(n > 0 && fpp > 0 && fpp < 1, s"need n>0, 0<fpp<1: n=$n fpp=$fpp")
    val raw = math.ceil(-n * math.log(fpp) / (math.log(2) * math.log(2)))
    // cap BEFORE word-rounding: a huge n saturates toLong at Long.MaxValue
    // and (m + 63) would overflow negative
    val m = math.min(raw, (1L << 30).toDouble).toLong
    (((m + 63) / 64) * 64).min(1L << 30).toInt
  }

  /** Optimal hash count for m bits over n keys: k = (m/n) ln 2. */
  def hashesFor(mBits: Int, n: Long): Int =
    math.max(1, math.round(mBits.toDouble / n * math.log(2)).toInt)

  private def h1(key: Column): Column = xxhash64(key)
  private def h2(key: Column): Column = xxhash64(key, lit(Salt))

  /** xxhash64 hashes int and bigint to DIFFERENT values, so a build over an
    * int key probed with the same values as bigint would silently drop
    * matching rows (false negatives). Canonicalize every integral key to
    * long on both sides; any other type must match exactly.
    */
  private def canonKey(df: DataFrame, name: String): (Column, DataType) =
    df.schema(name).dataType match {
      case ByteType | ShortType | IntegerType | LongType => (df(name).cast("long"), LongType)
      case other                                         => (df(name), other)
    }

  /** One-row frame (`bloom_bits` array<long>) over the side's keys. */
  def build(side: DataFrame, key: Column, mBits: Int, k: Int): DataFrame =
    side.select(h1(key).as("h1"), h2(key).as("h2"))
      .agg(BloomAgg.bloom(col("h1"), col("h2"), mBits, k).as("bloom_bits"))

  /** Maybe-contains predicate against a bitset column, reproducing
    * BloomAgg's positions with codegen'd built-ins. All-true on a key the
    * build saw; false ⇒ definitely absent.
    */
  def mightContain(bits: Column, key: Column, mBits: Int, k: Int): Column =
    mightContainHashes(bits, h1(key), h2(key), mBits, k)

  /** Same predicate over PRE-HASHED (h1, h2) columns — for callers that
    * bring their own hash family (e.g. the md5-based portable hashes whose
    * bit positions a DuckDB oracle can replicate verbatim). The pair must
    * be the exact columns the matching BloomAgg build aggregated.
    */
  def mightContainHashes(bits: Column, hash1: Column, hash2: Column,
                         mBits: Int, k: Int): Column = {
    val b1 = pmod(hash1, lit(BloomAgg.HashRange))
    val b2 = pmod(hash2, lit(BloomAgg.HashRange))
    (0 until k).map { i =>
      val pos = (b1 + lit(i.toLong) * b2) % lit(mBits.toLong)
      // pos is non-negative, so >>6 is the word index and &63 the bit index;
      // integer semantics throughout (no double division round-trip).
      element_at(bits, shiftright(pos, 6).cast("int") + 1)
        .bitwiseAND(call_function("shiftleft", lit(1L), (pos % 64).cast("int"))) =!= 0L
    }.reduce(_ && _)
  }

  /** `big` minus the rows whose key is definitely absent from `small`'s
    * key set. The bitset rides a 1-row broadcast; the predicate runs at
    * the scan, before any exchange.
    */
  def prefilter(big: DataFrame, bigKey: String, small: DataFrame,
                smallKey: String, mBits: Int, k: Int): DataFrame = {
    val (bigCol, bigT)     = canonKey(big, bigKey)
    val (smallCol, smallT) = canonKey(small, smallKey)
    require(bigT == smallT,
      s"bloom key types must canonicalize equal: $bigKey:$bigT vs $smallKey:$smallT")
    big.crossJoin(broadcast(build(small, smallCol, mBits, k)))
      .where(mightContain(col("bloom_bits"), bigCol, mBits, k))
      .drop("bloom_bits")
  }

  /** Bloom-reduced inner equi-join: prefilter `big`, then the exact join
    * (which also deletes the bloom's false positives). Result rows are
    * identical to `big ⋈ small` — the oracle for any query built on this.
    */
  def prefilteredJoin(big: DataFrame, bigKey: String, small: DataFrame,
                      smallKey: String, mBits: Int, k: Int): DataFrame = {
    val reduced = prefilter(big, bigKey, small, smallKey, mBits, k)
    reduced.join(small, reduced(bigKey) === small(smallKey), "inner")
  }
}
