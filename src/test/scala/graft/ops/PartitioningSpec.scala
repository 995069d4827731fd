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
}
