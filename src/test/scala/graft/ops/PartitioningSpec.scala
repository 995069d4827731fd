package graft.ops

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Pre-partitioning reuse: repartition on the key once, then every
  * downstream groupBy on that key satisfies its distribution requirement
  * without another exchange — the "pay the shuffle once" pattern for
  * pipelines that aggregate the same key repeatedly.
  */
class PartitioningSpec extends SparkSpec {
  import spark.implicits._

  test("groupBy on a pre-partitioned key adds no second exchange") {
    val df = (1 to 1000).map(i => (i % 50, i)).toDF("k", "v")
      .repartition(col("k"))
    val agg = df.groupBy(col("k")).agg(sum(col("v")).as("s"))
    agg.collect()
    // AQE's toString prints final + initial plans; judge the final one only
    val plan = agg.queryExecution.executedPlan.toString.split("== Initial Plan ==").head
    // exactly the repartition's exchange — the aggregate reuses it
    assert(plan.sliding("Exchange".length).count(_ == "Exchange") == 1, plan)
  }

  test("iterative-join cache: repartition(joinKey) before persist keeps the " +
    "big side exchange-free across iterations") {
    // Executable form of the round-6 hard-won rule (pagerank measured
    // 2-3x at two scales): distinct()/join leave a frame partitioned by
    // whatever key the UPSTREAM op chose, and caching THAT layout makes
    // every loop iteration re-shuffle the cached big side. The contract:
    // cache in the loop's join-key layout, and each iteration's join plans
    // exactly ONE exchange — the small (label/score) frame's.
    val edges = (1 to 2000).map(i => (i % 97, i % 31)).toDF("s", "t")
      .distinct()                       // leaves layout keyed (s, t)
      .repartition(col("t"))            // the rule under test
      .persist()
    edges.count()
    val labels = (0 until 31).map(t => (t, t.toLong)).toDF("t", "label")
    val step = edges.join(labels, Seq("t"))
      .groupBy(col("s")).agg(min(col("label")).as("label"))
    step.collect()
    // the InMemoryRelation node re-prints its cache-BUILD plan (including
    // the repartition's own exchange) — the iteration's plan is everything
    // above it, and that is where no edge-side exchange may appear
    val plan = step.queryExecution.executedPlan.toString
      .split("== Initial Plan ==").head
      .split("InMemoryRelation").head
    // tiny label side broadcasts under AQE, so the only exchange left is
    // the groupBy's on s; the cached edge side must contribute NONE
    val exchanges = plan.sliding("Exchange".length).count(_ == "Exchange")
    assert(plan.contains("InMemoryTableScan"), plan)
    assert(exchanges <= 1, s"cached big side re-shuffled:\n$plan")
    edges.unpersist(blocking = false)
  }
}
