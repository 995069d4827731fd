package graft.llm

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Greedy sequence packing — the training-data step that concatenates
  * documents into fixed-capacity context windows ("bins") so short docs
  * don't waste padded sequence slots.
  *
  * Greedy first-fit is inherently sequential, so the global problem is
  * sharded: docs land in `nShards` deterministic shards (id modulo), each
  * shard packs INDEPENDENTLY with one streaming pass in id order. That is
  * the 100 TB shape: parallelism = nShards (pick O(total cores)), per-task
  * state is three longs, nothing is collected, and the output is
  * reproducible under any partitioning because shard membership and
  * in-shard order depend only on the ids. Packing quality is unaffected by
  * sharding — bins never span shards by construction.
  *
  * Rules (mirrored by the recursive-CTE oracle in LlmOps): a doc extends
  * the current bin when fill + cost <= budget, else opens the next bin; an
  * oversized doc (cost > budget) therefore always sits alone in its own
  * bin.
  */
object Pack {

  /** Per-doc bin assignment: (doc_id, shard, bin). `idCol` must be numeric
    * and unique; `costCol` is the doc's token/char budget consumption.
    */
  def packGreedy(docs: DataFrame, idCol: String, costCol: String,
                 budget: Long, nShards: Int): DataFrame = {
    require(nShards >= 1, "nShards must be >= 1")
    val spark = docs.sparkSession
    import spark.implicits._
    docs
      .select(
        (col(idCol) % nShards).cast("long").as("shard"),
        col(idCol).cast("long").as("doc_id"),
        col(costCol).cast("long").as("cost"))
      // one partition per shard, packed in id order: repartition is the
      // only shuffle, and it ships (shard, id, cost) — 24 bytes/doc
      .repartition(nShards, col("shard"))
      .sortWithinPartitions(col("shard"), col("doc_id"))
      .as[(Long, Long, Long)]
      .mapPartitions { it =>
        // a hash-partition may hold several shards; state resets on the
        // shard boundary (rows arrive shard-major because of the sort)
        var curShard = Long.MinValue
        var bin = 0L
        var fill = 0L
        it.map { case (shard, id, cost) =>
          if (shard != curShard) { curShard = shard; bin = 0L; fill = cost }
          else if (fill + cost <= budget) fill += cost
          else { bin += 1; fill = cost }
          (id, shard, bin)
        }
      }
      .toDF("doc_id", "shard", "bin")
  }
}
