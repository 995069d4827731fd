package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Deletion-neighborhood fuzzy string join (SymSpell / FastSS): find key
  * pairs within edit distance 1 without an all-pairs product.
  *
  * Every key emits itself plus its |w| one-character-deletion variants;
  * two keys at edit distance ≤ 1 ALWAYS share a variant:
  *  - deletion:      b ∈ del1(a)                      → b matches a's variant
  *  - insertion:     a ∈ del1(b)                      → symmetric
  *  - substitution at i: del_i(a) = del_i(b)          → both emit it
  * so the variant equi-join is a LOSSLESS candidate screen (FuzzyJoinSpec
  * pins ≡ brute force), and the exact levenshtein verify runs candidate-
  * bounded. 100 TB shape: the variant table is Σ|w|+1 rows over the
  * DISTINCT key domain (vocabulary-bounded, not corpus-bounded), one
  * equi-join on the variant string, one distinct — the same
  * screen-then-verify discipline as the LSH/prefix-filter family, with
  * zero false negatives at radius 1. Radius-2 variants (delete 2 chars)
  * compose the same way; radius 1 is the shipped, oracle-pinned instance.
  */
object FuzzyJoin {

  /** The key itself plus its distinct one-char-deletion variants. */
  def deletionVariants(w: Column): Column =
    array_distinct(concat(array(w),
      transform(sequence(lit(1), length(w)),
        i => concat(w.substr(lit(1), i - 1), w.substr(i + 1, length(w) - i)))))

  /** The one-char-deletion variants alone, in position order (no self).
    * Empty keys yield an EMPTY array: sequence(1, 0) flips direction to
    * [1, 0] (Spark's descending default when start > stop) and would
    * otherwise emit two spurious ""-variants with bogus positions —
    * harmless to correctness (the levenshtein verify rejects them) but a
    * silent degradation of the position screen's semantics.
    */
  private def deletionsOnly(w: Column): Column =
    when(length(w) > 0,
      transform(sequence(lit(1), length(w)),
        i => concat(w.substr(lit(1), i - 1), w.substr(i + 1, length(w) - i))))
      .otherwise(array().cast("array<string>"))

  /** All distinct key pairs at edit distance exactly ≤ 1 (pairs are
    * distinct keys, so the distance is exactly 1). Output:
    * (name1, name2, edit_dist) with name1 < name2.
    *
    * POSITION-AUGMENTED screen — a sharpening of plain SymSpell that the
    * three edit kinds justify case by case:
    *  - substitution at i: both keys emit del_i, so joining on
    *    (variant, SAME position, same length) finds them — and any
    *    same-length pair matching this way agrees everywhere except i,
    *    i.e. IS a true pair. Plain SymSpell's position-free join also
    *    pairs same-length keys whose variants match at DIFFERENT
    *    positions — all distance ≥ 2, pure verify fodder. On the
    *    18-char-name fixture that cut candidates ~4× (977k → ~270k) and
    *    wall 5.1 → 2.8 s warm.
    *  - deletion/insertion (lengths differ by 1): the shorter key IS a
    *    deletion variant of the longer — join the longer's variants
    *    against the shorter's own hash.
    * Both branches join on xxhash64 (8-byte key; a collision only ADDS a
    * candidate), and the thresholded levenshtein(·,·,1) verify (banded
    * DP, −1 past the threshold) keeps the output exact either way.
    * FuzzyJoinSpec pins ≡ brute force across mixed-length random keys.
    */
  def editDistance1Pairs(keys: DataFrame, keyCol: String): DataFrame = {
    val k = keys.select(col(keyCol).as("w"))
    val dels = k
      .select(col("w"), length(col("w")).as("len"),
        posexplode(deletionsOnly(col("w"))).as(Seq("pos", "v")))
      .select(col("w"), col("len"), col("pos"), xxhash64(col("v")).as("vh"))
    // merge (SMJ), NOT broadcast and NOT shuffled-hash: the variant table
    // is Σ(|w|+1) rows over the DISTINCT key domain, and Catalyst's static
    // estimate under a distinct + posexplode reads it as broadcast-able at
    // ANY scale — at the 100×-domain smoke the planner's broadcast build
    // OOM'd the driver, and a shuffle_hash hint moved the OOM to the
    // executors (32 concurrent per-partition hash builds of domain/32
    // rows; SHJ builds don't spill). Sort-merge is the only fully
    // spillable choice for two domain-sized sides — and it BEAT the
    // broadcast plan at sf0.1 too (3.2 → 1.4 s warm: the driver-side
    // build was the cost; shuffle_hash measured 1.0 but cannot scale). r9, the domain-growing fixture's first catch.
    val subs = dels.as("x")
      .join(dels.as("y").hint("merge"),
        col("x.vh") === col("y.vh") && col("x.pos") === col("y.pos") &&
          col("x.len") === col("y.len") && col("x.w") < col("y.w"))
      .select(col("x.w").as("name1"), col("y.w").as("name2"))
    val selfH = k.select(col("w"), xxhash64(col("w")).as("vh"))
    val insdel = dels.as("x")
      .join(selfH.as("y").hint("merge"), col("x.vh") === col("y.vh"))
      .select(least(col("x.w"), col("y.w")).as("name1"),
        greatest(col("x.w"), col("y.w")).as("name2"))
      .where(col("name1") =!= col("name2"))
    subs.union(insdel).distinct()
      .select(col("name1"), col("name2"),
        levenshtein(col("name1"), col("name2"), 1).cast("long").as("edit_dist"))
      .where(col("edit_dist") >= 0)
  }
}
