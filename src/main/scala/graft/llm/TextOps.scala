package graft.llm

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import graft.ops.Core

/** Text-analysis operators for LLM training-data pipelines, over the
  * `documents` table. All are per-row scalar pipelines (no shuffle), built
  * from codegen'd built-ins — they scale linearly and survive 100 TB: the
  * only wide stages downstream are the dedup groupBys/joins.
  */
object TextOps {

  /** Whitespace tokens of a text column. */
  def tokens(text: Column): Column = split(text, " ")

  /** Distinct token set (shingle set for 1-gram MinHash / Jaccard). */
  def tokenSet(text: Column): Column = array_distinct(tokens(text))

  /** Word n-gram shingles: sliding windows of n tokens joined by space;
    * empty for texts shorter than n tokens (and for null texts — the old
    * lambda's when(size(null) >= n) fell to otherwise). ONE compiled pass
    * (r16, guide §4): the transform/slice/concat_ws lambda this wraps ran
    * interpreted per window at 25 call sites — see Shingles for the
    * pinned value contract (ShinglesSpec: lambda ≡ compiled, interpreted
    * ≡ codegen).
    */
  def shingles(text: Column, n: Int): Column =
    org.apache.spark.sql.graft.GraftSql.shingles(text, n)

  /** MinHash value for one seeded hash family member over a token array:
    * min over tokens of portable_hash64(seed || '|' || token).
    */
  def minhash(tokenArr: Column, seed: Int): Column =
    array_min(transform(tokenArr, t => Core.md5Hash64(concat(lit(s"$seed|"), t))))

  /** Token hash array — materialize this as its own column (projection
    * boundary) before fanning out to many consumers: Catalyst re-evaluates a
    * repeated non-attribute subexpression per reference, so 16 simhash bit
    * votes over an inline `transform` would do 16× the md5 work.
    */
  def tokenHashes(tokenArr: Column): Column =
    transform(tokenArr, t => Core.md5Hash64(t))

  /** SimHash with `bits` output bits over a materialized hash-array column:
    * for each bit b the sign of Σ_tokens (bit b of hash ? +1 : -1), packed
    * into a long.
    */
  def simhashOfHashes(hashes: Column, bits: Int): Column =
    (0 until bits).map { b =>
      val vote = aggregate(
        hashes,
        lit(0L),
        (acc, h) => acc + when(shiftright(h, b).bitwiseAND(lit(1L)) === 1L, 1L).otherwise(-1L)
      )
      when(vote > 0, shiftleft(lit(1L), b)).otherwise(lit(0L))
    }.reduce(_ + _)

  /** Content-defined chunking (the q_dedup_cdc_chunks core, extracted so
    * the FastCDC property — insertions shift boundaries only LOCALLY — is
    * spec-testable): boundaries fall after token c+k-1 wherever the
    * k-token rolling hash satisfies `span % modulus < target`. Returns one
    * row per chunk: (idCol, pos, chunk_md5), chunks in document order.
    * Each derived array materializes behind its own select (Catalyst
    * re-evaluates repeated non-attribute subexpressions).
    */
  def cdcChunks(df: DataFrame, idCol: String, textCol: String,
                k: Int, modulus: Int, target: Int): DataFrame = {
    import org.apache.spark.sql.graft.RollingHash.{rollingHash, P}
    df.select(col(idCol), tokens(col(textCol)).as("toks"))
      .select(col(idCol), col("toks"),
        transform(col("toks"), t => Core.md5Hash64(t) % P).as("th"))
      .select(col(idCol), col("toks"), rollingHash(col("th"), k).as("spans"))
      .select(col(idCol), col("toks"),
        array_sort(array_distinct(concat(
          when(size(col("spans")) > 0,
            transform(
              filter(sequence(lit(1), size(col("spans"))),
                i => element_at(col("spans"), i) % modulus < target),
              c => c + (k - 1)))
            .otherwise(array().cast("array<int>")),
          array(size(col("toks")))))).as("ends"))
      .select(col(idCol),
        posexplode(transform(sequence(lit(1), size(col("ends"))), idx => {
          val start = when(idx === 1, lit(1))
            .otherwise(element_at(col("ends"), idx - 1) + 1)
          md5(array_join(
            slice(col("toks"), start, element_at(col("ends"), idx) - start + 1),
            " "))
        })))
      .toDF(idCol, "pos", "chunk_md5")
  }
}
