package graft.functions

import graft.SparkSpec
import org.apache.spark.sql.functions._
import org.apache.spark.sql.graft.AsOf

/** Custom as-of join operator: backward match semantics, left-outer nulls,
  * key boundaries, and the physical plan shape.
  */
class AsOfJoinSpec extends SparkSpec {
  import spark.implicits._

  private def left = Seq(
    (1L, 10L, "a"), (1L, 20L, "b"), (1L, 5L, "c"),
    (2L, 15L, "d"),
    (3L, 7L, "e")
  ).toDF("k", "ts", "tag")

  private def right = Seq(
    (1L, 8L, 100.0), (1L, 20L, 200.0), (1L, 25L, 300.0),
    (2L, 1L, 400.0)
  ).toDF("rk", "rts", "rv")

  test("backward as-of picks the latest right row at or before each left ts") {
    val out = AsOf.join(left, right, "k", "rk", "ts", "rts")
      .select(col("tag"), col("rv"))
      .as[(String, Option[Double])].collect().toMap
    assert(out == Map(
      "a" -> Some(100.0), // ts=10 -> rts=8
      "b" -> Some(200.0), // ts=20 -> rts=20 (inclusive)
      "c" -> None,        // ts=5 precedes all right rows for k=1
      "d" -> Some(400.0), // k=2 -> rts=1
      "e" -> None))       // k=3 has no right rows
  }

  test("plan contains the custom exec with co-partitioned sorted children") {
    val df = AsOf.join(left, right, "k", "rk", "ts", "rts")
    df.collect()
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("AsOfJoin"), plan)
    assert(plan.contains("Sort "), plan)
    assert(plan.contains("Exchange hashpartitioning"), plan)
  }

  test("self-join (shared lineage) re-aliases the right side instead of breaking binding") {
    // same DataFrame on both sides: every event matched with the latest
    // event at-or-before it per key — i.e. itself (duplicate expr ids on
    // the right output used to corrupt attribute binding in the exec)
    val events = Seq((1L, 10L, 1.0), (1L, 20L, 2.0), (2L, 5L, 3.0))
      .toDF("k", "ts", "v")
    val out = AsOf.join(events, events, "k", "k", "ts", "ts")
    assert(out.columns.count(_ == "v") == 2)
    // both sides share column NAMES (normal for self-joins) — positional
    // rename before selecting
    val pairs = out.toDF("lk", "lts", "lv", "rk", "rts", "rv")
      .as[(Long, Long, Double, Long, Long, Double)].collect().toSet
    // each row matches itself (rightTs <= leftTs picks the equal-ts row)
    assert(pairs == Set(
      (1L, 10L, 1.0, 1L, 10L, 1.0),
      (1L, 20L, 2.0, 1L, 20L, 2.0),
      (2L, 5L, 3.0, 2L, 5L, 3.0)))
  }

  test("handles empty right side and duplicate left timestamps") {
    val emptyRight = right.where(lit(false))
    val out = AsOf.join(left, emptyRight, "k", "rk", "ts", "rts")
    assert(out.count() == 5)
    assert(out.where(col("rv").isNotNull).count() == 0)

    val dupLeft = Seq((1L, 10L, "x"), (1L, 10L, "y")).toDF("k", "ts", "tag")
    val out2 = AsOf.join(dupLeft, right, "k", "rk", "ts", "rts")
      .select(col("tag"), col("rv")).as[(String, Double)].collect().toMap
    assert(out2 == Map("x" -> 100.0, "y" -> 100.0))
  }
}
