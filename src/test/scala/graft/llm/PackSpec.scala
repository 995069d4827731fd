package graft.llm

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Greedy packing invariants: bins respect the budget, order is the greedy
  * fold's, and the result is identical under any input partitioning (the
  * property the recursive-CTE oracle depends on).
  */
class PackSpec extends SparkSpec {
  import spark.implicits._

  private def world(n: Int) =
    (0 until n).map(i => (i.toLong, (i * 37 % 90 + 10).toLong)) // costs 10..99

  private def brute(docs: Seq[(Long, Long)], budget: Long,
                    nShards: Int): Map[Long, (Long, Long)] =
    docs.groupBy(_._1 % nShards).flatMap { case (shard, ds) =>
      var bin = 0L; var fill = 0L; var first = true
      ds.sortBy(_._1).map { case (id, cost) =>
        if (first) { first = false; fill = cost }
        else if (fill + cost <= budget) fill += cost
        else { bin += 1; fill = cost }
        id -> ((shard, bin))
      }
    }

  test("packGreedy matches the sequential greedy fold per shard") {
    val docs = world(200)
    val out = Pack.packGreedy(docs.toDF("doc_id", "n_chars"),
      "doc_id", "n_chars", budget = 128L, nShards = 4)
      .as[(Long, Long, Long)].collect()
      .map(r => r._1 -> ((r._2, r._3))).toMap
    assert(out == brute(docs, 128L, 4))
  }

  test("packGreedy never overfills a bin except for a single oversized doc") {
    val docs = world(300) :+ (300L, 500L) // one doc over budget
    val stats = Pack.packGreedy(docs.toDF("doc_id", "n_chars"),
      "doc_id", "n_chars", budget = 128L, nShards = 4)
      .join(docs.toDF("doc_id", "cost"), "doc_id")
      .groupBy(col("shard"), col("bin"))
      .agg(sum(col("cost")).as("fill"), count(lit(1)).as("n"))
      .as[(Long, Long, Long, Long)].collect()
    stats.foreach { case (_, _, fill, n) =>
      assert(fill <= 128L || n == 1L, s"overfilled multi-doc bin: $fill x $n")
    }
    assert(stats.exists { case (_, _, fill, n) => fill == 500L && n == 1L })
  }

  test("packGreedy is deterministic under input partitioning") {
    val docs = world(250)
    def run(parts: Int) =
      Pack.packGreedy(docs.toDF("doc_id", "n_chars").repartition(parts),
        "doc_id", "n_chars", budget = 100L, nShards = 5)
        .as[(Long, Long, Long)].collect().sortBy(_._1).toSeq
    assert(run(1) == run(23))
  }
}
