package graft.llm

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Product quantization invariants (llm.Pq): exact self-coding for
  * codebook donors, code-range sanity, and ADC consistency with the
  * assignment distances.
  */
class PqSpec extends SparkSpec {
  import spark.implicits._

  // deterministic 24 vectors of Dim floats (codebook donors are ids 0-15)
  private def emb = {
    val rows = (0 until 24).map { id =>
      (id.toLong, (0 until Pq.Dim).map(i =>
        math.sin(id * 131 + i * 17).toFloat).toArray)
    }
    rows.toDF("vec_id", "embedding")
      .select(col("vec_id"), Vectors.vecD(col("embedding")).as("v"))
  }

  test("codebook donors self-code with zero quantization error") {
    val sub = Pq.subvectors(emb)
    val out = Pq.codes(Pq.assign(sub, Pq.codebook(sub)))
      .where(col("vec_id") < Pq.K)
      .as[(Long, String, Double)].collect()
    assert(out.length == Pq.K)
    out.foreach { case (id, codes, qerr) =>
      assert(codes == Seq.fill(Pq.M)(id).mkString(","), s"vec $id: $codes")
      assert(qerr == 0.0, s"vec $id qerr $qerr")
    }
  }

  test("every vector gets exactly M codes, all in [0, K)") {
    val sub = Pq.subvectors(emb)
    val asg = Pq.assign(sub, Pq.codebook(sub))
    assert(asg.count() == 24L * Pq.M)
    assert(asg.where(col("code") < 0 || col("code") >= Pq.K).count() == 0)
  }

  test("ADC top-20 recall clears the 0.1 floor on the parquet fixture") {
    val sfDir =
      sys.env.getOrElse("SPARK_GRAFT_FIXTURE_DIR", "/root/testdata/sf0.001")
    assume(new java.io.File(sfDir).isDirectory,
      s"fixture dir $sfDir absent — set SPARK_GRAFT_FIXTURE_DIR")
    val row = graft.queries.SimSearch.queries("q_sim_pq_recall")(spark, sfDir)
      .collect().head
    val recall = row.getAs[Double]("recall")
    assert(row.getAs[Long]("n_hit") <= 20L)
    // uniform random embeddings + sample codebooks are PQ's worst case;
    // 0.1 is the honest floor of the 32x compression, deterministic on
    // this fixture, so a drop is a real argmin/LUT regression, not noise
    assert(recall >= 0.1, s"PQ ADC recall $recall below floor")
  }

  test("Lloyd-trained codebooks never increase total distortion vs the " +
    "sample codebooks they start from") {
    val sub = Pq.subvectors(emb)
    def totalErr(cw: org.apache.spark.sql.DataFrame): Double =
      Pq.codes(Pq.assign(sub, cw))
        .agg(sum(col("qerr"))).as[Double].head()
    val sampleErr = totalErr(Pq.codebook(sub))
    val trainedErr = totalErr(Pq.trainedCodebook(sub, iters = 2))
    // Lloyd from the same init is monotone non-increasing; the 1e-6
    // centroid rounding can wiggle the last digits, hence the epsilon
    assert(trainedErr <= sampleErr + 1e-3,
      s"training increased distortion: $trainedErr > $sampleErr")
  }

  test("ADC distance for a codebook donor equals the LUT rows its own " +
    "codes select (M exact lookups)") {
    val sub = Pq.subvectors(emb)
    val cw = Pq.codebook(sub)
    val asg = Pq.assign(sub, cw)
    val lut = Pq.adcLut(sub.where(col("vec_id") === 0), cw)
    // vector 5 is a donor: its codes are all 5, so its ADC distance to
    // query 0 must equal sum_j lut(j, 5)
    val adc = Pq.adcDistances(asg.where(col("vec_id") === 5), lut)
      .as[(Long, Double)].head()._2
    val expected = lut.where(col("code") === 5)
      .agg(round(sum(col("pd")), 4)).as[Double].head()
    assert(adc == expected, s"$adc != $expected")
  }
}
