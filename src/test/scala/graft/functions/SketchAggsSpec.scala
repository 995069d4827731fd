package graft.functions

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Sketch-aggregator semantics: determinism under re-partitioning is the
  * load-bearing property — a merge-order-sensitive sketch could never hold
  * a cross-engine hash oracle.
  */
class SketchAggsSpec extends SparkSpec {
  import spark.implicits._

  test("histQuantiles interpolates inside the crossing bucket") {
    // values 1..100, width 10: buckets 0..10. For q=0.5: n=100, rank=50,
    // bucket 4 (40..50) holds 41-49? No: floor(x/10) -> 50 lands in bucket
    // 5. Bucket b holds [10b, 10b+10): counts b0=9 (1-9), b1..b9=10, b10=1.
    // rank 50: cum through b4 = 49, crossing bucket b5 (c=10), est =
    // 50 + 10 * (50-49)/10 = 51.
    val df = (1 to 100).map(_.toDouble).toDF("x").repartition(7)
    val est = df.agg(HistQuantileAgg.histQuantiles(col("x"), 10.0, Seq(0.5))
      .as("q")).select(element_at(col("q"), 1)).as[Double].head()
    assert(math.abs(est - 51.0) < 1e-12)
  }

  test("histQuantiles is deterministic under any partitioning") {
    val vals = (1 to 5000).map(i => (i % 37) * 3.14 + i % 11)
    def run(parts: Int): Seq[Double] =
      vals.toDF("x").repartition(parts)
        .agg(HistQuantileAgg.histQuantiles(col("x"), 5.0, Seq(0.1, 0.5, 0.9, 1.0))
          .as("q")).as[Seq[Double]].head()
    assert(run(1) == run(13))
    assert(run(1) == run(64))
  }

  test("histQuantiles error is bounded by the bucket width") {
    val df = (1 to 1000).map(_.toDouble).toDF("x")
    val est = df.agg(HistQuantileAgg.histQuantiles(col("x"), 25.0, Seq(0.9))
      .as("q")).select(element_at(col("q"), 1)).as[Double].head()
    assert(math.abs(est - 900.0) <= 25.0)
  }

  test("bottomK keeps the k hash-smallest ids regardless of partitioning") {
    val rows = (1 to 500).map(i => (s"g${i % 3}", (i * 2654435761L) % 997, s"id$i"))
    val expected = rows.groupBy(_._1).view.mapValues(
      _.map(r => (r._2, r._3)).sorted.take(4).map(_._2)).toMap
    def run(parts: Int): Map[String, Seq[String]] =
      rows.toDF("g", "h", "id").repartition(parts)
        .groupBy(col("g"))
        .agg(BottomKAgg.bottomK(col("h"), col("id"), 4).as("ids"))
        .as[(String, Seq[String])].collect().toMap
    assert(run(1) == expected)
    assert(run(17) == expected)
  }

  test("bottomK with ties on hash breaks them by id") {
    val rows = Seq(("g", 5L, "b"), ("g", 5L, "a"), ("g", 5L, "c"), ("g", 1L, "z"))
    val out = rows.toDF("g", "h", "id")
      .groupBy(col("g"))
      .agg(BottomKAgg.bottomK(col("h"), col("id"), 3).as("ids"))
      .as[(String, Seq[String])].head()
    assert(out._2 == Seq("z", "a", "b"))
  }

  test("kmv keeps the k smallest DISTINCT hashes, sorted, under any partitioning") {
    val rnd = new scala.util.Random(11)
    // heavy duplication: 5000 draws from 300 distinct values
    val vals = (0 until 5000).map(_ => ("g", rnd.nextInt(300).toLong * 977L))
    val expected = vals.map(_._2).distinct.sorted.take(16)
    def run(parts: Int): Seq[Long] =
      vals.toDF("g", "h").repartition(parts)
        .groupBy(col("g")).agg(KmvAgg.kmv(col("h"), 16).as("sk"))
        .as[(String, Seq[Long])].head()._2
    assert(run(1) == expected)
    assert(run(29) == expected) // dedup across partial buffers, not just within
  }

  test("kmv merge is lossless: union sketch ≡ declarative merge of part sketches") {
    val rnd = new scala.util.Random(23)
    val rows = (0 until 4000).map(i => (s"day${i % 7}", rnd.nextLong() >>> 4))
    val daily = rows.toDF("day", "h")
      .groupBy(col("day")).agg(KmvAgg.kmv(col("h"), 32).as("sk"))
    // merged-from-parts (the q_etl_kmv_rollup weekly path)
    val merged = daily.agg(
      slice(array_sort(array_distinct(flatten(collect_list(col("sk"))))), 1, 32)
        .as("sk")).as[Seq[Long]].head()
    // built directly from the union
    val direct = rows.toDF("day", "h")
      .agg(KmvAgg.kmv(col("h"), 32).as("sk")).as[Seq[Long]].head()
    assert(merged == direct)
  }

  test("kmv under-full sketch is the exact distinct set") {
    val out = Seq(("g", 9L), ("g", 3L), ("g", 9L), ("g", 7L))
      .toDF("g", "h").groupBy(col("g"))
      .agg(KmvAgg.kmv(col("h"), 16).as("sk"))
      .as[(String, Seq[Long])].head()
    assert(out._2 == Seq(3L, 7L, 9L))
  }
}
