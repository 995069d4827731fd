package graft.llm

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Deterministic Lloyd iterations: convergence on separable clusters,
  * reproducibility, tie-breaking.
  */
class KMeansSpec extends SparkSpec {
  import spark.implicits._

  // two tight clusters around (0,0) and (10,10); ids interleaved so the
  // seed centroids (2 lowest ids) start one in each cluster
  private def e = Seq(
    (0L, Seq(0.1, 0.0)), (1L, Seq(10.1, 10.0)),
    (2L, Seq(0.0, 0.2)), (3L, Seq(9.9, 10.1)),
    (4L, Seq(0.2, 0.1)), (5L, Seq(10.0, 9.9))
  ).toDF("vec_id", "v")

  test("fit converges to the two cluster means") {
    val cents = KMeans.fit(e, k = 2, updates = 2).toMap
    assert(math.abs(cents(0).head - 0.1) < 1e-6)      // mean of 0.1, 0.0, 0.2
    assert(math.abs(cents(1).head - 10.0) < 1e-6)     // mean of 10.1, 9.9, 10.0
    assert(cents(0)(1) == 0.1 && cents(1)(1) == 10.0)
  }

  test("assignment maps every vector to its own cluster deterministically") {
    val cents = KMeans.fit(e, k = 2, updates = 2)
    val asn = e.select(col("vec_id"), col("v"), Vectors.dotFast(col("v"), col("v")).as("vv"))
      .select(col("vec_id"), KMeans.assignment(col("v"), col("vv"), cents).as("cid"))
      .as[(Long, Int)].collect().toMap
    assert(asn == Map(0L -> 0, 2L -> 0, 4L -> 0, 1L -> 1, 3L -> 1, 5L -> 1))
  }

  test("equidistant points break ties to the lower centroid id") {
    val cents = Seq((0, Seq(0.0)), (1, Seq(2.0)))
    val cid = Seq(Seq(1.0)).toDF("v")
      .select(col("v"), Vectors.dotFast(col("v"), col("v")).as("vv"))
      .select(KMeans.assignment(col("v"), col("vv"), cents).as("cid")).as[Int].head()
    assert(cid == 0)
  }
}
