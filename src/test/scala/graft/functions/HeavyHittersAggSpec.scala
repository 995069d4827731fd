package graft.functions

import graft.SparkSpec
import org.apache.spark.sql.functions._
import org.scalacheck.Gen
import org.scalacheck.rng.Seed

/** Misra-Gries guarantee: any item with frequency > n/(k+1) must appear in
  * the summary, with its count underestimated by at most n/(k+1) — checked
  * deterministically and as a property over random skewed streams (the
  * counts themselves are merge-order-dependent, so only the guarantee is
  * assertable).
  */
class HeavyHittersAggSpec extends SparkSpec {
  import spark.implicits._

  test("planted heavy hitters always survive the k-bounded sketch") {
    // 60% "hot", 25% "warm", rest singletons; k = 4 -> threshold n/5 = 20%
    val rows = Seq.fill(60)("hot") ++ Seq.fill(25)("warm") ++
      (0 until 15).map(i => s"cold$i")
    val out = rows.toDF("w")
      .agg(HeavyHittersAgg.heavyHitters(col("w"), 4).as("hh"))
      .as[Map[String, Long]].head()
    assert(out.size <= 4)
    assert(out.contains("hot") && out.contains("warm"))
    // undercount bound: true - reported <= n/(k+1) = 20
    assert(out("hot") >= 60L - 20L && out("hot") <= 60L)
    assert(out("warm") >= 25L - 20L && out("warm") <= 25L)
  }

  test("null inputs are skipped like builtin aggregates (no null map key crash)") {
    val rows = Seq(Some("a"), None, Some("a"), Some("b"), None).toDF("w")
    val out = rows.agg(HeavyHittersAgg.heavyHitters(col("w"), 2).as("hh"))
      .as[Map[String, Long]].head()
    assert(out == Map("a" -> 2L, "b" -> 1L))
  }

  test("property: guarantee holds over random skewed streams and partitionings") {
    val gen = Gen.zip(
      Gen.listOfN(120, Gen.frequency(
        5 -> Gen.const("H"), 2 -> Gen.const("W"),
        3 -> Gen.choose(0, 50).map(i => s"t$i"))),
      Gen.choose(2, 6), Gen.choose(1, 6))
    (0 until 8).foreach { i =>
      val (rows, k, parts) = gen.pureApply(Gen.Parameters.default, Seed(i.toLong))
      val n = rows.size
      val trueCounts = rows.groupBy(identity).view.mapValues(_.size.toLong).toMap
      val out = rows.toDF("w").repartition(parts)
        .agg(HeavyHittersAgg.heavyHitters(col("w"), k).as("hh"))
        .as[Map[String, Long]].head()
      assert(out.size <= k, s"seed=$i")
      val bound = n.toDouble / (k + 1)
      trueCounts.foreach { case (item, c) =>
        if (c > bound)
          assert(out.contains(item), s"seed=$i k=$k parts=$parts: $item freq=$c > $bound missing")
      }
      out.foreach { case (item, reported) =>
        val truth = trueCounts.getOrElse(item, 0L)
        assert(reported <= truth && truth - reported <= bound.ceil.toLong + 1,
          s"seed=$i: $item reported=$reported true=$truth")
      }
    }
  }
}
