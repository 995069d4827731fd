package graft.llm

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Deterministic Lloyd's k-means over an embedding DataFrame — the IVF
  * training path (q_sim_ann_ivf uses seed vectors as stand-in centroids;
  * this builds real ones). MLlib-free: each iteration is one assignment
  * job + one per-dimension mean aggregation; centroids (k × dim doubles)
  * live on the driver and enter the plan as broadcast literals.
  *
  * Determinism contract (for cross-engine reproducibility): init = the k
  * lowest vec_ids; distances rounded to 1e-9 with ties to the lower cid;
  * centroid components rounded to 1e-6 after every mean. FP summation-order
  * noise (~1e-14) cannot flip either rounding except on knife-edge values —
  * this is what lets the distance use the expanded dot-product form below
  * even though its summation order differs from the oracle's direct
  * sum((x−c)²).
  *
  * Scale: assignment is narrow (k×dim flops per row against a literal);
  * the mean is one groupBy(cid, dim) over posexploded members — shuffles
  * k×dim tiny partial sums after map-side combine. The input is cached for
  * the duration of the fit loop (init collect + one action per iteration
  * would otherwise re-scan the source per action).
  */
object KMeans {

  /** Assignment column: argmin over centroids of rounded squared L2
    * distance, ties to the lower cid (array_min on struct(d, cid)).
    *
    * ‖v−c‖² is computed as vv − 2·(v·c) + ‖c‖² so both dot products ride
    * the codegen'd graft_dot primitive loop — the earlier
    * `aggregate(zip_with(...))` HOF fold dispatched a lambda per element
    * per centroid and dominated the whole query (~60 s → ~1 s at sf0.1).
    * ‖c‖² folds to a driver-side constant. Cancellation bound: the expanded
    * form's error is ~‖v‖²·dim·ε; with unit-scale embedding components
    * (‖v‖² ≈ dim) that is ~1e-14 — five orders below the 1e-9 rounding
    * quantum. Components of O(100) would close that gap; if inputs ever
    * move to that scale, revert to a direct sum((x−c)²) fold.
    *
    * `vv` must be ‖v‖² materialized by the CALLER behind its own select:
    * Catalyst re-evaluates repeated non-attribute subexpressions per
    * reference, so passing `dot(v, v)` inline here would recompute it k
    * times per row.
    */
  def assignment(v: Column, vv: Column, cents: Seq[(Int, Seq[Double])]): Column =
    array_min(array(cents.map { case (cid, cv) =>
      val cc = cv.map(x => x * x).sum
      struct(
        round(vv - lit(2.0) * Vectors.dotFast(v, typedLit(cv)) + lit(cc), 9).as("d"),
        lit(cid).as("cid"))
    }: _*)).getField("cid")

  /** `updates` Lloyd iterations from the k lowest-id vectors; returns the
    * final centroids. `e` must have columns (vec_id long, v array<double>).
    */
  def fit(e: DataFrame, k: Int, updates: Int): Seq[(Int, Seq[Double])] = {
    val cached = e.cache()
    try {
      var cents: Seq[(Int, Seq[Double])] = cached
        .where(col("vec_id") < k)
        .orderBy(col("vec_id"))
        .collect()
        .map(r => (r.getLong(0).toInt, r.getSeq[Double](1)))
        .toSeq
      for (_ <- 1 to updates) {
        // assignment and posexplode stay in separate selects: generator
        // extraction runs before struct-alias resolution and would strip the
        // argmin struct's field names (FIELD_NOT_FOUND on `cid` otherwise)
        val assigned = cached
          .select(col("v"), Vectors.dotFast(col("v"), col("v")).as("vv"))
          .select(assignment(col("v"), col("vv"), cents).as("cid"), col("v"))
          .select(col("cid"), posexplode(col("v")).as(Seq("dim", "x")))
        cents = assigned
          .groupBy(col("cid"), col("dim"))
          .agg(round(avg(col("x")), 6).as("cx"))
          .collect()
          .map(r => (r.getInt(0), r.getInt(1), r.getDouble(2)))
          .groupBy(_._1)
          .map { case (cid, rows) => (cid, rows.sortBy(_._2).map(_._3).toSeq) }
          .toSeq.sortBy(_._1)
      }
      cents
    } finally cached.unpersist(blocking = false)
  }
}
