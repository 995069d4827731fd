package graft.functions

import graft.SparkSpec
import org.apache.spark.sql.functions._

class MinKDistinctAggSpec extends SparkSpec {
  import spark.implicits._

  test("reduce/merge/finish agree with distinct-sort-take-k") {
    val agg = new MinKDistinctAgg(3)
    val vals = Seq(9L, 2L, 9L, 7L, 2L, 1L, 8L, 1L)
    val viaReduce = agg.finish(vals.foldLeft(agg.zero)(agg.reduce)).toSeq
    val (l, r) = vals.splitAt(3)
    val viaMerge = agg.finish(agg.merge(
      l.foldLeft(agg.zero)(agg.reduce), r.foldLeft(agg.zero)(agg.reduce))).toSeq
    val expected = vals.distinct.sorted.take(3)
    assert(viaReduce == expected)
    assert(viaMerge == expected)
  }

  test("as an aggregate it matches slice(sort_array(collect_set), 1, k) " +
    "with duplicate-heavy groups") {
    val df = Seq(
      (1, 50L), (1, 10L), (1, 50L), (1, 30L), (1, 20L), (1, 40L), (1, 10L),
      (2, 7L), (2, 7L),
      (3, 3L)
    ).toDF("g", "v")
    val got = df.groupBy($"g")
      .agg(MinKDistinctAgg.minK($"v", 3).as("mk"))
      .as[(Int, Seq[Long])].collect().toMap
    val want = df.groupBy($"g")
      .agg(slice(sort_array(collect_set($"v")), 1, 3).as("mk"))
      .as[(Int, Seq[Long])].collect().toMap
    assert(got == want)
    assert(got(1) == Seq(10L, 20L, 30L))
    assert(got(2) == Seq(7L))
  }

  test("buffer never exceeds k and the agg rides the bounded exec") {
    val agg = new MinKDistinctAgg(4)
    val buf = (1L to 100L).foldLeft(agg.zero)(agg.reduce)
    assert(buf.length == 4)
    val df = (0 until 2000).map(i => (i % 300, (i * 7L) % 97))
      .toDF("g", "v")
      .groupBy($"g").agg(MinKDistinctAgg.minK($"v", 5).as("mk"))
    assert(df.queryExecution.executedPlan.toString
      .contains("BoundedObjectHashAggregate"))
    assert(df.count() == 300)
  }
}
