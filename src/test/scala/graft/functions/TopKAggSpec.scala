package graft.functions

import graft.SparkSpec
import org.apache.spark.sql.functions._
import graft.ops.Scoring

class TopKAggSpec extends SparkSpec {
  import spark.implicits._

  test("reduce/merge/finish agree with sort-desc-take-k") {
    val agg = new TopKAgg(3)
    val vals = Seq(5.0, 1.0, 9.0, 7.0, 3.0, 8.0)
    val viaReduce = agg.finish(vals.foldLeft(agg.zero)(agg.reduce)).toSeq
    val (l, r) = vals.splitAt(2)
    val viaMerge = agg.finish(agg.merge(
      l.foldLeft(agg.zero)(agg.reduce), r.foldLeft(agg.zero)(agg.reduce))).toSeq
    val expected = vals.sorted.reverse.take(3)
    assert(viaReduce == expected)
    assert(viaMerge == expected)
  }

  test("as an aggregate expression it matches collect_list+sort+slice") {
    val df = Seq(
      (1, 0.3), (1, 0.9), (1, 0.1), (1, 0.8), (2, 0.5)
    ).toDF("g", "s")
    val viaAgg = df.groupBy(col("g"))
      .agg(TopKAgg.topK(col("s"), 2).as("t"))
      .as[(Int, Seq[Double])].collect().toMap
    val viaArray = df.groupBy(col("g"))
      .agg(Scoring.topK(collect_list(col("s")), 2).as("t"))
      .as[(Int, Seq[Double])].collect().toMap
    assert(viaAgg == viaArray)
    assert(viaAgg(1) == Seq(0.9, 0.8))
  }
}
