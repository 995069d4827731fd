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
}
