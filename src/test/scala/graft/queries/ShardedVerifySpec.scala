package graft.queries

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** The range-sharded LSH candidate verify (SimSearch.shardedCosVerify) —
  * the documented path past the ~10⁷-vector broadcast ceiling of
  * q_sim_ann_lsh_scaled's whole-table verify broadcasts. Pins (a)
  * row-for-row output equality with the single-broadcast path on the
  * real scaled-LSH candidate set, (b) that every grid cell still joins
  * via broadcast (no pair-sized exchange ever carries a vector array —
  * the property whose loss measured as a >60 GB spill at 2M vectors),
  * and (c) that the R² grid's broadcast references collapse to reused
  * exchanges rather than 2·R² physical builds.
  */
class ShardedVerifySpec extends SparkSpec {

  private val sfDir =
    sys.env.getOrElse("SPARK_GRAFT_FIXTURE_DIR", "/root/testdata/sf0.001")

  private def assumeFixtures(): Unit =
    assume(new java.io.File(sfDir).isDirectory,
      s"fixture dir $sfDir absent — set SPARK_GRAFT_FIXTURE_DIR")

  test("sharded verify ≡ broadcast verify on the scaled-LSH candidate set") {
    assumeFixtures()
    val (pairs, _, _, _) = SimSearch.scaledLshCandidates(spark, sfDir)
    val en = SimSearch.normEmbeds(spark, sfDir)
    val sharded = SimSearch.shardedCosVerify(en, pairs, shards = 4)
    val bcast = pairs
      .join(broadcast(en.select(col("vec_id").as("v1"), col("vn").as("a"))),
        Seq("v1"))
      .join(broadcast(en.select(col("vec_id").as("v2"), col("vn").as("b"))),
        Seq("v2"))
      .select(col("v1"), col("v2"),
        round(graft.llm.Vectors.dotFast(col("a"), col("b")), 6).as("cos"))
    val nPairs = pairs.count()
    assert(nPairs > 0, "fixture produced no LSH candidates — vacuous test")
    // multiset equality both directions (cos included, so the fetched
    // vectors — not just the ids — must match)
    assert(sharded.exceptAll(bcast).isEmpty, "sharded rows missing from broadcast path")
    assert(bcast.exceptAll(sharded).isEmpty, "broadcast rows missing from sharded path")
    assert(sharded.count() == nPairs,
      "grid filter dropped or duplicated candidates")
  }

  test("every grid cell joins via broadcast, and shard broadcasts are reused " +
    "across the grid") {
    assumeFixtures()
    val (pairs, _, _, _) = SimSearch.scaledLshCandidates(spark, sfDir)
    val en = SimSearch.normEmbeds(spark, sfDir)
    val sharded = SimSearch.shardedCosVerify(en, pairs, shards = 4)
    // execute THROUGH the dataset's own QueryExecution (a write would
    // plan a fresh one and leave this plan un-finalized under AQE —
    // reuse only appears in the FINAL adaptive plan)
    sharded.collect()
    val plan = sharded.queryExecution.executedPlan.toString
    assert(!plan.contains("SortMergeJoin") && !plan.contains("ShuffledHashJoin"),
      s"a vector fetch left the broadcast strategy:\n$plan")
    assert(plan.contains("BroadcastHashJoin"), plan)
    // 4 shards × 2 sides = 8 physical broadcast builds; the other
    // 2·16 − 8 = 24 references must be reuses. Pin reuse EXISTS (the
    // exact count is AQE-sensitive; zero reuse means 32 builds and the
    // grid's memory math is broken).
    assert(plan.contains("ReusedExchange"),
      s"no broadcast reuse across the shard grid:\n$plan")
  }
}
