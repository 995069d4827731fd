package graft.functions

import graft.SparkSpec
import org.apache.spark.sql.functions._

class TopKPairAggSpec extends SparkSpec {
  import spark.implicits._

  private def brute(vals: Seq[(Double, Long)], k: Int): Seq[(Double, Long)] =
    vals.sortBy { case (s, id) => (-s, id) }.take(k)

  test("reduce/merge/finish agree with sort-by-(score desc, id asc)-take-k " +
    "including score ties") {
    val agg = new TopKPairAgg(3)
    val vals = Seq((0.5, 9L), (0.9, 4L), (0.9, 2L), (0.1, 1L), (0.5, 3L))
    val viaReduce = agg.finish(vals.foldLeft(agg.zero)(agg.reduce)).toSeq
    val (l, r) = vals.splitAt(2)
    val viaMerge = agg.finish(agg.merge(
      l.foldLeft(agg.zero)(agg.reduce), r.foldLeft(agg.zero)(agg.reduce))).toSeq
    val expected = brute(vals, 3)
    assert(viaReduce == expected, viaReduce)
    assert(viaMerge == expected, viaMerge)
  }

  test("as an aggregate it is partitioning-invariant and ≡ the row_number " +
    "window form") {
    import org.apache.spark.sql.expressions.Window
    val rows = for (g <- 1 to 5; i <- 1 to 40)
      yield (g.toLong, (i * 2654435761L % 97).toDouble / 97.0, i.toLong * g)
    val df = rows.toDF("g", "s", "id").repartition(7)
    val viaAgg = df.groupBy(col("g"))
      .agg(TopKPairAgg.topK(col("s"), col("id"), 3).as("t"))
      .select(col("g"), posexplode(col("t")))
      .select(col("g"), (col("pos") + 1).as("rank"),
        col("col._2").as("id"), col("col._1").as("s"))
      .as[(Long, Long, Long, Double)].collect().toSet
    val w = Window.partitionBy(col("g")).orderBy(col("s").desc, col("id"))
    val viaWindow = df
      .withColumn("rank", row_number().over(w).cast("long"))
      .where(col("rank") <= 3)
      .select(col("g"), col("rank"), col("id"), col("s"))
      .as[(Long, Long, Long, Double)].collect().toSet
    assert(viaAgg == viaWindow)
  }
}
