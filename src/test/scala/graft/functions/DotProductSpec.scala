package graft.functions

import graft.SparkSpec
import graft.llm.Vectors
import org.apache.spark.sql.functions._

/** Native DotProduct expression: interpreted + codegen paths, null
  * semantics, SQL registration through GraftExtensions.
  */
class DotProductSpec extends SparkSpec {
  import spark.implicits._

  test("matches the HOF form on random vectors") {
    val rnd = new scala.util.Random(11)
    val rows = Seq.fill(20)((Seq.fill(8)(rnd.nextDouble()), Seq.fill(8)(rnd.nextDouble())))
    val df = rows.toDF("a", "b").select(
      Vectors.dot(col("a"), col("b")).as("hof"),
      Vectors.dotFast(col("a"), col("b")).as("native"))
    df.as[(Double, Double)].collect().foreach { case (h, n) =>
      assert(math.abs(h - n) < 1e-12)
    }
  }

  test("null array yields null; shorter length wins") {
    val df = Seq(
      (Some(Seq(1.0, 2.0)), Seq(3.0, 4.0, 5.0)),
      (None, Seq(1.0))
    ).toDF("a", "b").select(Vectors.dotFast(col("a"), col("b")).as("d"))
    val out = df.collect()
    assert(out(0).getDouble(0) == 11.0) // 1*3 + 2*4, third element ignored
    assert(out(1).isNullAt(0))
  }

  test("resolves by name from SQL via GraftExtensions") {
    val v = spark.sql("SELECT graft_dot(array(1.0d, 2.0d), array(3.0d, 4.0d)) AS d")
      .as[Double].head()
    assert(v == 11.0)
  }

  test("casts float arrays implicitly") {
    val v = spark.sql("SELECT graft_dot(array(CAST(1.5 AS FLOAT), CAST(2 AS FLOAT)), array(2.0d, 3.0d)) AS d")
      .as[Double].head()
    assert(v == 9.0)
  }
}
