package graft.ops

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Rank-weighted (harmonic-sum) scoring, the reference's core analytic.
  *
  * Reference semantics (platformDataBackendDrugDiseaseSimilarity.sc:293-338):
  * per group, collect scores, sort descending, keep top K (K=100, sc:297-298),
  * then fold Σ sᵢ / i² over 1-based rank i (sc:299-324). Source weighting:
  * literature pre-scaled ×0.2 before a 2-element re-rank (sc:325-337).
  *
  * Expressed with native higher-order functions (codegen-visible, no UDF):
  * slice∘sort_array for top-K, zip_with+sequence for ranks, aggregate for the
  * fold. At 100 TB the collect_list is bounded by the top-K slice; the
  * groupBy itself is a standard hash-agg shuffle on the association keys.
  */
object Scoring {

  /** Top-K scores, descending: `slice(sort_array(scores, desc), 1, k)`. */
  def topK(scores: Column, k: Int): Column =
    slice(sort_array(scores, asc = false), 1, k)

  /** Harmonic fold Σ sᵢ/i² over an already rank-ordered array.
    * Empty/null guard: sequence(1, 0) would flip to a DESCENDING [1,0] and
    * zip_with would null-pad, poisoning the fold — so empty folds to 0.
    */
  def harmonicFold(sorted: Column): Column =
    when(size(sorted) > 0,
      aggregate(
        zip_with(sorted, sequence(lit(1), size(sorted)), (e, i) => e / pow(i, lit(2))),
        lit(0.0),
        (acc, el) => acc + el
      )).otherwise(lit(0.0))

  /** Full reference scoring of a collected score array: top-K then fold. */
  def harmonicTopK(scores: Column, k: Int = 100): Column =
    harmonicFold(topK(scores, k))

  /** Two-source combine (sc:325-337): literature weighted ×0.2, re-ranked
    * against genetics, harmonic-folded again.
    */
  def harmonicCombine(genetics: Column, literature: Column): Column =
    harmonicFold(sort_array(array(genetics, literature * lit(0.2)), asc = false))
}
