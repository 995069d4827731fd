package graft.llm

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Byte-pair-encoding tokenizer: train merge rules over a corpus, apply
  * them per row — the standard subword tokenizer of LLM data pipelines
  * (q_text_tokens' regex splitter is the pre-tokenizer; this learns the
  * vocabulary on top of it).
  *
  * Scale shape: training aggregates over the DISTINCT-WORD table (Zipf
  * collapses a 100 TB corpus to a vocabulary orders of magnitude smaller),
  * one pair-count aggregation + one argmax collect per merge — the same
  * driver-held-model pattern as KMeans.fit (the learned merges are tiny and
  * enter apply() as literals). Application is a narrow per-row fold, no
  * shuffle.
  *
  * Determinism: the best pair is argmax on (count, pair) with ties broken
  * by the lexicographically SMALLEST pair, so any engine reproduces the
  * same merge sequence.
  */
object Bpe {

  /** (word, count) vocabulary of a corpus — whitespace pre-tokenization. */
  def vocab(docs: DataFrame, textCol: String): DataFrame =
    docs
      .select(explode(split(col(textCol), "\\s+")).as("word"))
      .where(length(col("word")) > 0)
      .groupBy(col("word"))
      .agg(count(lit(1)).as("n"))

  /** Symbol sequence of a word under the given merge rules: start from
    * characters, apply each merge left-to-right non-overlapping, in rule
    * order (the BPE apply algorithm). Pure Column fold — codegen-friendly,
    * no UDF.
    */
  def applyMerges(word: Column, merges: Seq[(String, String)]): Column = {
    val chars = filter(split(word, ""), c => length(c) > 0)
    // all rules in ONE compiled expression (r16, guide §4): the old
    // foldLeft chained one interpreted aggregate-lambda pass per rule,
    // each step copying the accumulator array (O(len²) allocations per
    // word per rule — BpeMerge scaladoc has the full account; BpeSpec
    // pins row equality against the verbatim lambda form).
    if (merges.isEmpty) chars
    else org.apache.spark.sql.graft.GraftSql.bpeMerge(chars, merges)
  }

  /** One merge rule applied over a symbol array: every adjacent (a, b)
    * becomes a‖b, scanning left to right without overlap — the compiled
    * BpeMerge pass (a merged symbol is emitted immediately so it can't
    * chain into the next match within this pass).
    */
  private[llm] def mergeOnce(syms: Column, a: String, b: String): Column =
    org.apache.spark.sql.graft.GraftSql.bpeMerge(syms, Seq((a, b)))

  /** Learn `nMerges` merge rules from the corpus: per iteration, count
    * adjacent symbol pairs weighted by word frequency, take the most
    * frequent (ties → lexicographically smallest pair), merge everywhere.
    *
    * The symbol table is MATERIALIZED between iterations (eager
    * localCheckpoint — also cuts the growing mergeOnce lineage), so each
    * round applies only the NEWEST rule instead of re-folding every prior
    * merge from raw characters: per-iteration work stays O(1) merge passes
    * regardless of how many rules are already learned. One aggregation job
    * plus a 1-row collect per merge.
    */
  def train(docs: DataFrame, textCol: String, nMerges: Int): Seq[(String, String)] = {
    val v = vocab(docs, textCol).cache()
    try {
      var syms = v
        .select(filter(split(col("word"), ""), c => length(c) > 0).as("s"), col("n"))
        .localCheckpoint()
      var merges = Vector.empty[(String, String)]
      var done = false
      while (merges.size < nMerges && !done) {
        val best = syms
          .select(posexplode(slice(col("s"), lit(1), greatest(size(col("s")) - 1, lit(0))))
            .as(Seq("i", "a")), col("s"), col("n"))
          .select(col("a"), expr("s[i + 1]").as("b"), col("n"))
          .groupBy(col("a"), col("b"))
          .agg(sum(col("n")).as("cnt"))
          .orderBy(col("cnt").desc, col("a"), col("b"))
          .limit(1)
          .collect()
        if (best.isEmpty) done = true
        else {
          val (a, b) = (best(0).getString(0), best(0).getString(1))
          merges :+= ((a, b))
          syms = syms.select(mergeOnce(col("s"), a, b).as("s"), col("n"))
            .localCheckpoint()
        }
      }
      merges
    } finally v.unpersist(blocking = false)
  }
}
