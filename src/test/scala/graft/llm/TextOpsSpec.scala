package graft.llm

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Shingling, simhash, and vector-hash determinism. */
class TextOpsSpec extends SparkSpec {
  import spark.implicits._

  test("cdcChunks: boundaries are content-defined — a front insertion " +
    "leaves most downstream chunk hashes intact (the FastCDC property)") {
    // 400 deterministic pseudo-random tokens; the same text with one token
    // inserted at the front. Fixed-width segmentation would shift EVERY
    // boundary and share zero chunks; content-defined boundaries re-align
    // after the edit, so most chunks survive by hash.
    val toks = (0 until 400).map(i => s"w${Vectors.md5Long(s"tok|$i") % 1000}")
    val orig = toks.mkString(" ")
    val edited = ("INSERTED" +: toks).mkString(" ")
    val df = Seq((1L, orig), (2L, edited)).toDF("doc_id", "text")
    val chunks = TextOps.cdcChunks(df, "doc_id", "text", 4, 64, 8)
      .as[(Long, Int, String)].collect()
    val a = chunks.filter(_._1 == 1L).map(_._3).toSet
    val b = chunks.filter(_._1 == 2L).map(_._3).toSet
    val shared = (a intersect b).size
    assert(a.size > 10, s"degenerate chunking: ${a.size} chunks")
    assert(shared >= a.size / 2,
      s"only $shared/${a.size} chunks survived a 1-token front insertion")
  }

  test("cdcChunks reassemble losslessly: chunk count and order per doc") {
    val df = Seq((1L, "a b c d e f g h i j k l m n o p")).toDF("doc_id", "text")
    val rows = TextOps.cdcChunks(df, "doc_id", "text", 4, 64, 8)
      .as[(Long, Int, String)].collect().sortBy(_._2)
    // positions are dense from 0 and hashes are well-formed md5
    assert(rows.map(_._2).toSeq == rows.indices.toSeq)
    assert(rows.forall(_._3.matches("[0-9a-f]{32}")))
  }

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
