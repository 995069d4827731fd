package graft.functions

import graft.SparkSpec
import graft.ops.Scoring
import org.apache.spark.sql.functions._

/** The injected optimizer rule must swap collect-then-slice for the bounded
  * aggregator without changing a single output value.
  */
class RewriteTopKSpec extends SparkSpec {
  import spark.implicits._

  private def df = Seq(
    (1, 0.3), (1, 0.9), (1, 0.1), (1, 0.8), (1, 0.5), (2, 0.7)
  ).toDF("g", "s")

  test("slice(sort_array(collect_list)) aggregates rewrite to TopKAgg") {
    val q = df.groupBy(col("g"))
      .agg(Scoring.topK(collect_list(col("s")), 3).as("t"))
    assert(q.queryExecution.optimizedPlan.toString.contains("TopKAgg"),
      s"expected rewrite in:\n${q.queryExecution.optimizedPlan}")
    val out = q.as[(Int, Seq[Double])].collect().toMap
    assert(out(1) == Seq(0.9, 0.8, 0.5))
    assert(out(2) == Seq(0.7))
  }

  test("rewrite fires inside composed scoring expressions") {
    val q = df.groupBy(col("g"))
      .agg(Scoring.harmonicTopK(collect_list(col("s")), 100).as("h"))
    assert(q.queryExecution.optimizedPlan.toString.contains("TopKAgg"))
    val out = q.as[(Int, Double)].collect().toMap
    // g=1 sorted desc [0.9,0.8,0.5,0.3,0.1] -> sum s_i/i^2
    val expected = Seq(0.9, 0.8, 0.5, 0.3, 0.1).zipWithIndex
      .map { case (v, i) => v / math.pow(i + 1.0, 2) }.sum
    assert(math.abs(out(1) - expected) < 1e-9)
  }

  test("nullable inputs rewrite WITH a null filter (no spurious 0.0 from primitive decode)") {
    val ndf = Seq((1, Some(0.3)), (1, None), (1, Some(0.9))).toDF("g", "s")
    val q = ndf.groupBy(col("g"))
      .agg(Scoring.topK(collect_list(col("s")), 2).as("t"))
    // the rewrite must still fire — file-sourced columns are ALWAYS nullable,
    // so bailing out here would disable the rule exactly where it matters —
    // but with an IS NOT NULL aggregate filter matching collect_list's drop
    val plan = q.queryExecution.optimizedPlan.toString
    assert(plan.contains("TopKAgg"), plan)
    assert(q.select(col("t")).as[Seq[Double]].head() == Seq(0.9, 0.3))
  }

  test("slice in a Project over the Aggregate rewrites too (the DataFrame-API shape)") {
    // collect in .agg, slice in the NEXT select — how q_harmonic_topk-style
    // queries naturally compose; the rewrite must cross the projection
    val q = df.groupBy(col("g"))
      .agg(collect_list(col("s")).as("xs"))
      .select(col("g"), Scoring.topK(col("xs"), 3).as("t"))
    assert(q.queryExecution.optimizedPlan.toString.contains("TopKAgg"),
      s"expected cross-projection rewrite in:\n${q.queryExecution.optimizedPlan}")
    val out = q.as[(Int, Seq[Double])].collect().toMap
    assert(out(1) == Seq(0.9, 0.8, 0.5))
    assert(out(2) == Seq(0.7))
  }

  test("cross-projection rewrite aborts when the array has another consumer") {
    // size(xs) observes the FULL array — truncating it would change results
    val q = df.groupBy(col("g"))
      .agg(collect_list(col("s")).as("xs"))
      .select(col("g"), Scoring.topK(col("xs"), 2).as("t"),
        size(col("xs")).as("n"))
    assert(!q.queryExecution.optimizedPlan.toString.contains("TopKAgg"))
    val out = q.as[(Int, Seq[Double], Int)].collect().map(r => r._1 -> ((r._2, r._3))).toMap
    assert(out(1) == ((Seq(0.9, 0.8), 5)))
  }

  test("ascending sort_array slices are NOT rewritten") {
    val q = df.groupBy(col("g"))
      .agg(slice(sort_array(collect_list(col("s"))), 1, 2).as("bottom"))
    assert(!q.queryExecution.optimizedPlan.toString.contains("TopKAgg"))
    assert(q.where(col("g") === 1).select(col("bottom"))
      .as[Seq[Double]].head() == Seq(0.1, 0.3))
  }
}
