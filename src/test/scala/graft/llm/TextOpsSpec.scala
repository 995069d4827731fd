package graft.llm

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Shingling, simhash, and vector-hash determinism. */
class TextOpsSpec extends SparkSpec {
  import spark.implicits._

  test("shingles are sliding word n-grams; short texts give empty arrays") {
    val df = Seq("a b c d", "a b", "a").toDF("text")
      .select(TextOps.shingles(col("text"), 3).as("sh"))
    val Array(s1, s2, s3) = df.as[Seq[String]].collect()
    assert(s1 == Seq("a b c", "b c d"))
    assert(s2 == Seq.empty)
    assert(s3 == Seq.empty)
  }

  test("simhash is deterministic and separates unrelated token sets") {
    val df = Seq("alpha beta gamma", "alpha beta gamma", "zeta eta theta iota")
      .toDF("text")
      .select(TextOps.tokenHashes(TextOps.tokenSet(col("text"))).as("hs"))
      .select(TextOps.simhashOfHashes(col("hs"), 16).as("h"))
    val Array(h1, h2, h3) = df.as[Long].collect()
    assert(h1 == h2)
    assert(h1 != h3)
    assert(h1 >= 0 && h1 < (1L << 16))
  }

  test("minhash of a superset set is <= minhash of the subset's min (monotone under union)") {
    // adding tokens can only lower (or keep) the min hash
    val df = Seq(Seq("a", "b"), Seq("a", "b", "c")).toDF("toks")
      .select(TextOps.minhash(col("toks"), seed = 1).as("mh"))
    val Array(sub, sup) = df.as[Long].collect()
    assert(sup <= sub)
  }
}
