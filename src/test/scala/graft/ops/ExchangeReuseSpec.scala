package graft.ops

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Exchange reuse: when one shuffled subplan feeds two consumers in the
  * same query, Spark materializes the shuffle once (ReusedExchange) —
  * self-joins of aggregates and union-of-aggregates patterns pay one
  * exchange, not two.
  */
class ExchangeReuseSpec extends SparkSpec {
  import spark.implicits._

  test("self-union of one aggregate reuses the shuffle") {
    val df = (1 to 500).map(i => (i % 20, i)).toDF("k", "v")
    val agg = df.groupBy(col("k")).agg(sum(col("v")).as("s"))
    val q = agg.union(agg)
    q.collect()
    val plan = q.queryExecution.executedPlan.toString.split("== Initial Plan ==").head
    assert(plan.contains("ReusedExchange") ||
      plan.sliding("Exchange".length).count(_ == "Exchange") == 1, plan)
  }
}
