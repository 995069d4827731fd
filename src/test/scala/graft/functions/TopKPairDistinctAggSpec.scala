package graft.functions

import graft.SparkSpec
import org.apache.spark.sql.functions._
import org.scalacheck.Gen
import org.scalacheck.rng.Seed

/** TopKPairDistinctAgg must equal distinct-then-TopKPairAgg on any input
  * honoring the contract (equal id ⇒ equal score within a group) — the
  * whole point is deleting the relational DISTINCT without changing one
  * output row. Property data replays duplicates aggressively so the
  * evicted-then-reinserted path is actually exercised.
  */
class TopKPairDistinctAggSpec extends SparkSpec {
  import spark.implicits._

  private val K = 3

  private def viaDistinct(rows: Seq[(Long, Double, Long)]) =
    rows.toDF("g", "score", "id").distinct()
      .groupBy($"g").agg(TopKPairAgg.topK($"score", $"id", K).as("t"))
      .select($"g", posexplode($"t"))
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getStruct(2)))
      .map(t => (t._1, t._2, t._3.getDouble(0), t._3.getLong(1))).toSet

  private def viaDedupAgg(rows: Seq[(Long, Double, Long)]) =
    rows.toDF("g", "score", "id")
      .groupBy($"g").agg(TopKPairDistinctAgg.topK($"score", $"id", K).as("t"))
      .select($"g", posexplode($"t"))
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getStruct(2)))
      .map(t => (t._1, t._2, t._3.getDouble(0), t._3.getLong(1))).toSet

  test("duplicates collapse: heavy replication changes nothing") {
    val base = Seq(
      (1L, 0.9, 10L), (1L, 0.8, 11L), (1L, 0.7, 12L), (1L, 0.6, 13L),
      (2L, 0.5, 10L), (2L, 0.5, 11L), (2L, 0.5, 12L), (2L, 0.5, 13L))
    // replicate every row 7x, shuffled — eviction + re-insert happens
    val rows = Seq.fill(7)(base).flatten
    assert(viaDedupAgg(rows) == viaDistinct(rows))
    assert(viaDedupAgg(rows) == viaDedupAgg(base))
  }

  test("ties break toward the lower id, identical to the window contract") {
    val rows = Seq((1L, 0.5, 9L), (1L, 0.5, 3L), (1L, 0.5, 7L),
      (1L, 0.5, 1L), (1L, 0.5, 9L), (1L, 0.5, 3L))
    val got = viaDedupAgg(rows).toSeq.sortBy(_._2)
    assert(got.map(_._4) == Seq(1L, 3L, 7L))
  }

  test("property: dedup-agg ≡ distinct-then-agg on random duplicated data") {
    val gen = for {
      n <- Gen.choose(1, 60)
      rows <- Gen.listOfN(n, for {
        g <- Gen.choose(0L, 3L)
        id <- Gen.choose(0L, 9L)
        // score must be a function of (g, id): the aggregator's contract
      } yield (g, ((g * 31 + id * 17) % 13).toDouble / 13.0, id))
      dups <- Gen.choose(1, 4)
    } yield Seq.fill(dups)(rows).flatten
    var seed = Seed(42L)
    (1 to 25).foreach { _ =>
      val rows = gen.pureApply(Gen.Parameters.default, seed)
      seed = seed.next
      assert(viaDedupAgg(rows) == viaDistinct(rows))
    }
  }

  test("NaN scores rank greatest and dedup like any other id") {
    val rows = Seq((1L, Double.NaN, 5L), (1L, 0.9, 1L), (1L, 0.8, 2L),
      (1L, Double.NaN, 5L), (1L, 0.7, 3L))
    val got = viaDedupAgg(rows).toSeq.sortBy(_._2)
    assert(got.map(_._4) == Seq(5L, 1L, 2L))
  }

  test("contract violations fail loudly: a duplicate id with a different " +
    "score raises instead of keep-first-arbitrary (r12 ADVICE guard)") {
    val rows = Seq((1L, 0.5, 7L), (1L, 0.6, 7L), (1L, 0.4, 8L))
    val ex = intercept[Throwable](viaDedupAgg(rows))
    def chain(t: Throwable): Seq[String] =
      if (t == null) Nil
      else Option(t.getMessage).toSeq ++ chain(t.getCause)
    assert(chain(ex).exists(_.contains("contract violation")),
      s"expected the contract guard in the failure chain, got: ${chain(ex)}")
  }

  test("buffer stays K-bounded and the rule grants hash mode (bounded marker)") {
    val agg = new TopKPairDistinctAgg(5)
    assert(agg.maxBufferBytes == 64L + 48L * 5)
    var buf = agg.zero
    (1 to 1000).foreach { i =>
      buf = agg.reduce(buf, ((i % 37).toDouble, (i % 37).toLong))
    }
    assert(buf.length <= 5)
  }
}
