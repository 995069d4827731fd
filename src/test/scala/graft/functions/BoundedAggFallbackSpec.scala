package graft.functions

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** The per-operator object-agg fallback rule (BoundedAggFallback): bounded
  * udaf nodes get the high-threshold exec, unbounded builtin collects stay
  * on the stock exec and the session's spill-safe 128-key default. Both
  * failure modes this guards were measured: default threshold sorted the
  * kNN pair stream (disk-kill at 2M, r10); a global 4M threshold held
  * ~500k live CollectSet HashSets per task and OOM'd the 1000x pipeline
  * (r11).
  */
class BoundedAggFallbackSpec extends SparkSpec {
  import spark.implicits._

  private def planOf(df: org.apache.spark.sql.DataFrame): String =
    df.queryExecution.executedPlan.toString

  private def stockObjectHashLines(plan: String): Seq[String] =
    plan.linesIterator.toVector.filter(l =>
      l.contains("ObjectHashAggregate") && !l.contains("BoundedObjectHashAggregate"))

  // > 128 distinct keys so hash mode past the session default is the only
  // way the bounded exec's threshold could matter
  private lazy val wide = (0 until 4000)
    .map(i => (i % 400, i.toDouble)).toDF("g", "s")

  test("all-bounded udaf agg plans as BoundedObjectHashAggregate " +
    "(both partial and final) and matches sort-desc-take-k") {
    val df = wide.groupBy($"g").agg(TopKAgg.topK($"s", 3).as("t"))
    val plan = planOf(df)
    assert(plan.contains("BoundedObjectHashAggregate"), plan)
    assert(stockObjectHashLines(plan).isEmpty,
      s"stock ObjectHashAggregate survived an all-bounded node:\n$plan")
    // results through the swapped exec stay exact across all 400 groups
    val got = df.select($"g", $"t").as[(Int, Seq[Double])].collect().toMap
    val want = (0 until 4000).map(i => (i % 400, i.toDouble))
      .groupBy(_._1).view.mapValues(_.map(_._2).sorted.reverse.take(3)).toMap
    assert(got.size == 400)
    want.foreach { case (g, exp) => assert(got(g) == exp, s"group $g") }
  }

  test("unbounded builtin collect_set stays on the stock exec") {
    val df = wide.groupBy($"g").agg(collect_set($"s").as("vs"))
    val plan = planOf(df)
    assert(!plan.contains("BoundedObjectHashAggregate"), plan)
    assert(stockObjectHashLines(plan).nonEmpty, plan)
  }

  test("a node mixing a bounded udaf with an unbounded builtin stays stock") {
    val df = wide.groupBy($"g")
      .agg(TopKAgg.topK($"s", 3).as("t"), collect_set($"s").as("vs"))
    val plan = planOf(df)
    assert(!plan.contains("BoundedObjectHashAggregate"), plan)
    // and still computes both correctly for a spot group
    val row = df.where($"g" === 7).select($"t", size($"vs"))
      .as[(Seq[Double], Int)].head()
    assert(row._1 == Seq(3607.0, 3207.0, 2807.0))
    assert(row._2 == 10)
  }

  test("global (no grouping) bounded agg over an empty input emits the " +
    "zero-buffer row through the swapped exec") {
    val empty = wide.where($"g" < 0)
    val out = empty.agg(TopKAgg.topK($"s", 3).as("t"))
    assert(planOf(out).contains("BoundedObjectHashAggregate"), planOf(out))
    assert(out.as[Seq[Double]].head() == Seq.empty[Double])
  }
}
