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

  test("compiled BpeMerge ≡ the verbatim old aggregate-lambda fold, " +
    "interpreted ≡ codegen, incl. chain/overlap/empty edges") {
    import org.apache.spark.sql.Column
    // the pre-r16 mergeOnce, verbatim — the value contract BpeMerge pins
    def lambdaMergeOnce(syms: Column, a: String, b: String): Column = {
      val zero = struct(
        array().cast("array<string>").as("acc"),
        lit(null).cast("string").as("prev"))
      aggregate(
        syms,
        zero,
        (st, x) => {
          val acc = st.getField("acc")
          val prev = st.getField("prev")
          when(prev.isNull, struct(acc.as("acc"), x.as("prev")))
            .when(prev === lit(a) && x === lit(b),
              struct(concat(acc, array(lit(a + b))).as("acc"),
                lit(null).cast("string").as("prev")))
            .otherwise(struct(concat(acc, array(prev)).as("acc"), x.as("prev")))
        },
        st => when(st.getField("prev").isNull, st.getField("acc"))
          .otherwise(concat(st.getField("acc"), array(st.getField("prev")))))
    }
    val rules = Seq(("a", "a"), ("a", "b"), ("aa", "b"))
    // words exercising: overlap runs (aaaa), rule chaining across passes
    // (aab -> aa,b -> aab via rule 3), no-match, empty, single char,
    // multi-byte chars, and a word containing the merged token literally
    val words = Seq("aab", "aaa", "aaaa", "aaab", "ba", "", "a", "ab",
      "aabaab", "ααβ", "xaaby", "aaxbb")
    val df = words.toDF("w")
      .select(col("w"),
        filter(split(col("w"), ""), c => length(c) > 0).as("chars"))
    val viaLambda = df.select(col("w"),
      rules.foldLeft(col("chars")) { case (s0, (a, b)) =>
        lambdaMergeOnce(s0, a, b) }.as("t"))
      .as[(String, Seq[String])].collect().toMap
    val viaExpr = df.select(col("w"),
      Bpe.applyMerges(col("w"), rules).as("t"))
      .as[(String, Seq[String])].collect().toMap
    assert(viaExpr == viaLambda)
    // interpreted path ≡ codegen path (eval() directly vs the plan above)
    import org.apache.spark.sql.graft.{BpeMerge, GraftSql}
    import org.apache.spark.sql.catalyst.expressions.Literal
    import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
    import org.apache.spark.unsafe.types.UTF8String
    words.foreach { w =>
      val chars = w.toCharArray.map(c => UTF8String.fromString(c.toString))
      val arr = new GenericArrayData(chars.asInstanceOf[Array[Any]])
      val got = BpeMerge(Literal.create(null), rules).nullSafeEval(arr)
        .asInstanceOf[ArrayData]
      val gotSeq = (0 until got.numElements())
        .map(i => got.getUTF8String(i).toString)
      assert(gotSeq == viaLambda(w), s"word '$w'")
    }
  }
}
