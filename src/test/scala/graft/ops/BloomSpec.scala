package graft.ops

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Bloom semi-join reduction contract (ops.Bloom + functions.BloomAgg):
  * no false negatives, prefilteredJoin ≡ plain join, canonical key typing,
  * and the plan shape that makes it a scale win — bitset on a 1-row
  * broadcast, probe predicate evaluated BEFORE the fact side's exchange.
  */
class BloomSpec extends SparkSpec {
  import spark.implicits._

  private val rng  = new scala.util.Random(42)
  private val keys = Seq.fill(500)(rng.nextLong() % 100000).distinct

  test("bitsFor / hashesFor sizing math") {
    val m = Bloom.bitsFor(1000, 0.01)
    assert(m % 64 == 0)
    // m = -n ln p / ln^2 2 ≈ 9.59 bits/key at 1% fpp
    assert(m >= 9 * 1000 && m <= 10 * 1000 + 64, m)
    val k = Bloom.hashesFor(m, 1000)
    assert(k >= 6 && k <= 8, k) // ≈ (m/n) ln 2 ≈ 6.6
    // cap holds
    assert(Bloom.bitsFor(Long.MaxValue / 4, 0.0001) == (1 << 30))
  }

  test("no false negatives: every built key passes mightContain") {
    val mBits = 64 * 64
    val k     = 4
    val df    = keys.toDF("key")
    val bits  = Bloom.build(df, col("key"), mBits, k)
    val misses = df.crossJoin(broadcast(bits))
      .where(!Bloom.mightContain(col("bloom_bits"), col("key"), mBits, k))
      .count()
    assert(misses == 0, s"$misses false negatives — bloom contract broken")
  }

  test("false-positive rate is bounded near the design point") {
    val n     = keys.size.toLong
    val mBits = Bloom.bitsFor(n, 0.01)
    val k     = Bloom.hashesFor(mBits, n)
    val bits  = Bloom.build(keys.toDF("key"), col("key"), mBits, k)
    val absent = (200000L until 202000L).toDF("key") // disjoint from keys
    val fps = absent.crossJoin(broadcast(bits))
      .where(Bloom.mightContain(col("bloom_bits"), col("key"), mBits, k))
      .count()
    // design fpp 1%; allow generous slack for hash variance on 2000 probes
    assert(fps <= 100, s"$fps/2000 false positives — way over 1% design point")
  }

  test("mightContainHashes matches BloomAgg positions for a caller-supplied " +
    "hash family (no false negatives under md5 hashes)") {
    // the portable-hash path used by q_dedup_decon_bloom: build and probe
    // must derive identical bit positions from the SAME (h1, h2) columns
    val mBits = 64 * 16
    val k     = 3
    val hashed = keys.toDF("key").select(
      graft.ops.Core.md5Hash64(col("key").cast("string")).as("h1"),
      graft.ops.Core.md5Hash64(concat(lit("x|"), col("key").cast("string"))).as("h2"))
    val bits = hashed.agg(
      graft.functions.BloomAgg.bloom(col("h1"), col("h2"), mBits, k).as("bloom_bits"))
    val misses = hashed.crossJoin(broadcast(bits))
      .where(!Bloom.mightContainHashes(col("bloom_bits"), col("h1"), col("h2"), mBits, k))
      .count()
    assert(misses == 0, s"$misses false negatives under custom hash family")
  }

  test("prefilteredJoin returns exactly the plain join's rows") {
    val big = Seq.tabulate(2000)(i => (i.toLong % 700, s"row$i")).toDF("k", "payload")
    val small = Seq.tabulate(50)(i => (i.toLong * 13, s"dim$i")).toDF("dk", "dim")
    val viaBloom = Bloom.prefilteredJoin(big, "k", small, "dk", mBits = 64 * 16, k = 3)
      .select("k", "payload", "dk", "dim")
    val plain = big.join(small, big("k") === small("dk"))
      .select("k", "payload", "dk", "dim")
    assert(viaBloom.count() == plain.count())
    assert(viaBloom.exceptAll(plain).count() == 0)
    assert(plain.exceptAll(viaBloom).count() == 0)
  }

  test("int key probed against long build canonicalizes — no dropped rows") {
    // xxhash64(int) != xxhash64(long) for the same value; prefilter must
    // canonicalize both sides to long or this join silently loses rows.
    val big   = Seq.tabulate(100)(i => (i, s"r$i")).toDF("k", "v") // int key
    val small = Seq.tabulate(20)(i => (i.toLong * 5, i)).toDF("dk", "d") // long key
    val joined = Bloom.prefilteredJoin(big, "k", small, "dk", mBits = 64 * 8, k = 3)
    assert(joined.count() == 20, "canonicalization lost matching rows")
  }

  test("mismatched non-integral key types are rejected loudly") {
    val big   = Seq(("a", 1)).toDF("k", "v")
    val small = Seq((1L, 1)).toDF("dk", "d")
    val e = intercept[IllegalArgumentException] {
      Bloom.prefilteredJoin(big, "k", small, "dk", mBits = 64, k = 1)
    }
    assert(e.getMessage.contains("canonicalize"))
  }

  test("plan: bitset rides a broadcast; probe filter sits BELOW the fact " +
    "exchange (q_join_bloom_prefilter)") {
    // parquet fixture, not a local Seq — ConvertToLocalRelation would
    // constant-fold a local fixture and erase the probe from the plan
    val sfDir =
      sys.env.getOrElse("SPARK_GRAFT_FIXTURE_DIR", "/root/testdata/sf0.001")
    assume(new java.io.File(sfDir).isDirectory,
      s"fixture dir $sfDir absent — set SPARK_GRAFT_FIXTURE_DIR")
    val plan = graft.SparkEntry.queries("q_join_bloom_prefilter")(spark, sfDir)
      .queryExecution.executedPlan
    val s = plan.toString
    // bitset arrives on a 1-row IdentityBroadcastMode exchange
    assert(s.contains("BroadcastExchange IdentityBroadcastMode"), s)
    // Catalyst folds the probe predicate into the cross-join condition; the
    // tree dump prints descendants AFTER ancestors, so the probe over the
    // fact key must appear after (= below) the agg's exchange. AQE wraps
    // the tree (collect can't see inside AdaptiveSparkPlanExec), hence the
    // string-order assertion.
    val exchangeAt = s.indexOf("Exchange hashpartitioning")
    val probeAt    = s.indexOf("xxhash64(l_partkey")
    assert(exchangeAt >= 0, s)
    assert(probeAt > exchangeAt,
      s"bloom probe not below the exchange — reduction lost:\n$s")
  }
}
