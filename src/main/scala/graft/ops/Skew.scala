package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Skew mitigation for hot join keys.
  *
  * First line of defense is AQE's skew-join splitting (on by default in
  * Spark 4) — it only fires for sort-merge joins with materialized shuffle
  * statistics. Salting is the explicit fallback for the cases AQE can't fix:
  * a replicated broadcast isn't possible and one key dominates a partition
  * (classic at 100 TB: the empty-string user_id, the boilerplate document
  * bucket).
  */
object Skew {

  /** Salted equi-join of a skewed `large` side against a `small`-ish side
    * that still exceeds the broadcast threshold.
    *
    * The large side gets a random salt in [0, saltFactor); the small side is
    * replicated saltFactor× (explode of a literal range); the join key
    * becomes (key, salt) — a hot key's rows now spread over saltFactor
    * partitions instead of one straggler. Cost: small side ×saltFactor.
    * Inner joins only (salting drops no rows: every (key, salt) pair on the
    * large side has exactly one partner row when the key matches).
    */
  def saltedJoin(large: DataFrame, small: DataFrame, key: String,
                 saltFactor: Int): DataFrame = {
    val saltedLarge = large
      .withColumn("__salt", (rand(seed = 42) * saltFactor).cast("int"))
    val saltedSmall = small
      .withColumn("__salt", explode(sequence(lit(0), lit(saltFactor - 1))))
    saltedLarge
      .join(saltedSmall, Seq(key, "__salt"))
      .drop("__salt")
  }

  /** Two-phase EXACT distinct count for a skewed groupBy. Algebraic
    * aggregates get map-side partials from Spark already; the resistant ones
    * (count distinct via collect_set) funnel every value of a hot key into
    * one reducer. Salting by hash(value) mod F splits each key's values into
    * F DISJOINT buckets — phase 1 dedupes per (key, salt) across F reducers,
    * phase 2 just sums the per-bucket cardinalities (disjointness makes the
    * sum exact).
    */
  def skewedDistinctCount(df: DataFrame, key: String, valueCol: String,
                          saltFactor: Int): DataFrame =
    df
      .withColumn("__salt", pmod(hash(col(valueCol)), lit(saltFactor)))
      .groupBy(col(key), col("__salt"))
      .agg(count_distinct(col(valueCol)).as("__bucket_distinct"))
      .groupBy(col(key))
      .agg(sum(col("__bucket_distinct")).cast("long").as("n_distinct"))
}
