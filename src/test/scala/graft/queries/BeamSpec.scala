package graft.queries

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Graph beam search (q_sim_graph_beam): the serving-path walk over the
  * probe-2 kNN graph. Pins well-formedness, that the graph rounds
  * genuinely improve on the seed set (else the expansion degenerated),
  * and agreement between the gate query and an independently-computed
  * recall.
  */
class BeamSpec extends SparkSpec {
  private val dir =
    sys.env.getOrElse("SPARK_GRAFT_FIXTURE_DIR", "/root/testdata/sf0.001")

  private lazy val beam =
    SimSearch.queries("q_sim_graph_beam")(spark, dir)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))

  test("output is well-formed: contiguous ranks, descending scores, " +
    "no duplicate ids, query vector excluded") {
    assert(beam.nonEmpty)
    assert(beam.map(_._1).sorted.toSeq == (1L to beam.length).toSeq)
    assert(beam.sortBy(_._1).sliding(2).forall {
      case Array(a, b) => a._3 >= b._3
      case _           => true
    })
    assert(beam.map(_._2).distinct.length == beam.length)
    assert(beam.forall(_._2 != 0L))
  }

  test("graph rounds improve on the seed set: the beam's best score " +
    "beats or ties the best seed, strictly better somewhere") {
    val en = SimSearch.normEmbeds(spark, dir)
    val n = SimSearch.embeds(spark, dir).count()
    val qv = en.where(col("vec_id") === 0)
      .select(col("vn")).head().getSeq[Double](0)
    val qvCol = array(qv.map(lit): _*)
    val every = math.max(1L, n / 8)
    val seedScores = en
      .where(pmod(graft.ops.Core.md5Hash64(concat(lit("beam|"),
        col("vec_id").cast("string"))), lit(every)) === 0 &&
        col("vec_id") =!= 0)
      .select(round(graft.llm.Vectors.dotFast(col("vn"), qvCol), 6)
        .as("cos"))
      .collect().map(_.getDouble(0))
    assert(seedScores.nonEmpty, "hash picked no seeds")
    val bestSeed = seedScores.max
    assert(beam.map(_._3).max >= bestSeed)
    // on the default fixture the walk must actually move: some beam
    // member outscores every seed (a correct implementation could tie on
    // an adversarial fixture; here it measurably should not)
    if (java.nio.file.Paths.get(dir).toAbsolutePath.normalize
        .getFileName.toString == "sf0.001")
      assert(beam.map(_._3).max > bestSeed,
        "beam never left the seed set on the strict fixture")
  }

  test("batch beam is well-formed per query: contiguous ranks, no " +
    "duplicates, own qid excluded, and ranks follow (cos DESC, id ASC)") {
    val rows = SimSearch.queries("q_sim_graph_beam_batch")(spark, dir)
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getDouble(3)))
    assert(rows.nonEmpty)
    rows.groupBy(_._1).foreach { case (qid, qr) =>
      assert(qr.map(_._2).sorted.toSeq == (1L to qr.length).toSeq,
        s"qid $qid ranks not contiguous")
      assert(qr.map(_._3).distinct.length == qr.length)
      assert(qr.forall(_._3 != qid), s"qid $qid returned itself")
      val ordered = qr.sortBy(_._2)
      assert(ordered.sliding(2).forall {
        case Array(a, b) => a._4 > b._4 || (a._4 == b._4 && a._3 < b._3)
        case _           => true
      }, s"qid $qid rank order violates (cos DESC, id ASC)")
    }
  }

  test("the store-backed walk serves the identical result: " +
    "q_sim_graph_beam_stored ≡ q_sim_graph_beam, row for row") {
    val stored = SimSearch.queries("q_sim_graph_beam_stored")(spark, dir)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
    assert(stored.toSeq == beam.toSeq)
  }

  test("the store-backed BATCH walk serves the identical result: " +
    "q_sim_graph_beam_batch_stored ≡ q_sim_graph_beam_batch, row for row") {
    def rowSet(q: String) =
      SimSearch.queries(q)(spark, dir).collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
          r.getDouble(3))).toSet
    val inline = rowSet("q_sim_graph_beam_batch")
    val stored = rowSet("q_sim_graph_beam_batch_stored")
    assert(inline.nonEmpty)
    assert(stored == inline)
  }

  test("the recall gate agrees with an independent truth computation") {
    val row = SimSearch.queries("q_sim_graph_beam_recall")(spark, dir)
      .collect().head
    val nTrue = row.getLong(0)
    val nHit = row.getLong(1)
    assert(nTrue == 10L)
    assert(nHit >= 0L && nHit <= 10L)
    val en = SimSearch.normEmbeds(spark, dir)
    val qv = en.where(col("vec_id") === 0)
      .select(col("vn")).head().getSeq[Double](0)
    val qvCol = array(qv.map(lit): _*)
    val truth = en.where(col("vec_id") =!= 0)
      .select(col("vec_id"),
        round(graft.llm.Vectors.dotFast(col("vn"), qvCol), 6).as("cos"))
      .orderBy(col("cos").desc, col("vec_id"))
      .limit(10).collect().map(_.getLong(0)).toSet
    assert(nHit == beam.map(_._2).count(truth.contains))
  }
}
