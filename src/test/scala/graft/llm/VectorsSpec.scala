package graft.llm

import graft.SparkSpec
import org.apache.spark.sql.functions._

class VectorsSpec extends SparkSpec {
  import spark.implicits._

  test("dot, norm, cosine on known vectors") {
    val df = Seq((Seq(1.0, 2.0, 3.0), Seq(4.0, 5.0, 6.0))).toDF("a", "b")
      .select(
        Vectors.dot(col("a"), col("b")).as("d"),
        Vectors.norm(col("a")).as("n"),
        Vectors.cosine(col("a"), col("a")).as("self"))
    val (d, n, self) = df.as[(Double, Double, Double)].head()
    assert(d == 32.0)
    assert(math.abs(n - math.sqrt(14.0)) < 1e-12)
    assert(math.abs(self - 1.0) < 1e-12)
  }

  test("hyperplanes are deterministic, bounded, and non-degenerate") {
    val p1 = Vectors.hyperplanes(16, 64)
    val p2 = Vectors.hyperplanes(16, 64)
    assert(p1 == p2)
    assert(p1.flatten.forall(h => h >= -1000 && h <= 1000))
    assert(p1.distinct.size == 16) // no two planes identical
  }

  test("md5Long matches the Column-side md5Hash64") {
    val scalaSide = Vectors.md5Long("hello world")
    val sparkSide = Seq("hello world").toDF("s")
      .select(graft.ops.Core.md5Hash64(col("s"))).as[Long].head()
    assert(scalaSide == sparkSide)
  }
}
