package graft.llm

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** BPE trainer/applier semantics: frequency-ordered merges, deterministic
  * tie-breaks, left-to-right non-overlapping application.
  */
class BpeSpec extends SparkSpec {
  import spark.implicits._

  test("train learns merges in frequency order with lexicographic ties") {
    val docs = Seq("aa aa ab").toDF("text")
    // pair counts round 1: (a,a) -> 2, (a,b) -> 1 => first merge (a,a)
    // round 2: words [aa], [aa], [a,b] => only pair (a,b)
    val merges = Bpe.train(docs, "text", nMerges = 2)
    assert(merges == Seq(("a", "a"), ("a", "b")))
  }

  test("applyMerges tokenizes unseen words with the learned rules") {
    val merges = Seq(("a", "a"), ("a", "b"))
    val out = Seq("aab", "aaa", "ba").toDF("w")
      .select(Bpe.applyMerges(col("w"), merges).as("t"))
      .as[Seq[String]].collect().toSeq
    // aab: [a,a,b] -(a,a)-> [aa,b]; (a,b) doesn't fire on [aa,b]
    // aaa: [a,a,a] -(a,a)-> [aa,a]  (left-to-right, non-overlapping)
    // ba:  no rule matches
    assert(out == Seq(Seq("aa", "b"), Seq("aa", "a"), Seq("b", "a")))
  }

  test("merge application is lossless: concat of symbols rebuilds the word") {
    val docs = Seq("the quick brown fox the the quick").toDF("text")
    val merges = Bpe.train(docs, "text", nMerges = 5)
    assert(merges.size == 5)
    val bad = Bpe.vocab(docs, "text")
      .select(col("word"),
        concat_ws("", Bpe.applyMerges(col("word"), merges)).as("rebuilt"))
      .where(col("word") =!= col("rebuilt"))
      .count()
    assert(bad == 0L)
  }

  test("training stops early when no pairs remain") {
    val docs = Seq("a b c").toDF("text") // single-char words: zero pairs
    assert(Bpe.train(docs, "text", nMerges = 3).isEmpty)
  }
}
