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
  * noise (~1e-14) cannot flip either rounding except on knife-edge values.
  *
  * Scale: assignment is narrow (k×dim flops per row against a literal);
  * the mean is one groupBy(cid, dim) over posexploded members — shuffles
  * k×dim tiny partial sums after map-side combine.
  */
object KMeans {

  /** Squared L2 distance between a vector column and a constant centroid. */
  private def sqDist(v: Column, cv: Seq[Double]): Column =
    aggregate(zip_with(v, typedLit(cv), (a, b) => (a - b) * (a - b)),
      lit(0.0), (acc, x) => acc + x)

  /** Assignment column: argmin over centroids of rounded distance,
    * ties to the lower cid (array_min on struct(d, cid)).
    */
  def assignment(v: Column, cents: Seq[(Int, Seq[Double])]): Column =
    array_min(array(cents.map { case (cid, cv) =>
      struct(round(sqDist(v, cv), 9).as("d"), lit(cid).as("cid"))
    }: _*)).getField("cid")

  /** `updates` Lloyd iterations from the k lowest-id vectors; returns the
    * final centroids. `e` must have columns (vec_id long, v array<double>).
    */
  def fit(e: DataFrame, k: Int, updates: Int): Seq[(Int, Seq[Double])] = {
    var cents: Seq[(Int, Seq[Double])] = e
      .where(col("vec_id") < k)
      .orderBy(col("vec_id"))
      .collect()
      .map(r => (r.getLong(0).toInt, r.getSeq[Double](1)))
      .toSeq
    for (_ <- 1 to updates) {
      // assignment and posexplode stay in separate selects: generator
      // extraction runs before struct-alias resolution and would strip the
      // argmin struct's field names (FIELD_NOT_FOUND on `cid` otherwise)
      val assigned = e
        .select(assignment(col("v"), cents).as("cid"), col("v"))
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
  }
}
