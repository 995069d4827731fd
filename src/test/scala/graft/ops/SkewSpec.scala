package graft.ops

import graft.SparkSpec
import org.apache.spark.sql.functions._

class SkewSpec extends SparkSpec {
  import spark.implicits._

  test("saltedJoin produces the same rows as a plain inner join") {
    // hot key: "x" carries 500 of 600 rows
    val large = (Seq.fill(500)("x") ++ (1 to 100).map(i => s"k$i"))
      .zipWithIndex.toDF("key", "payload")
    val small = (Seq("x") ++ (1 to 50).map(i => s"k$i")).zipWithIndex.toDF("key", "dim")
    val plain = large.join(small, Seq("key"))
      .select(col("key"), col("payload"), col("dim"))
      .as[(String, Int, Int)].collect().sorted.toSeq
    val salted = Skew.saltedJoin(large, small, "key", saltFactor = 8)
      .select(col("key"), col("payload"), col("dim"))
      .as[(String, Int, Int)].collect().sorted.toSeq
    assert(salted == plain)
    assert(salted.count(_._1 == "x") == 500)
  }

  test("skewedDistinctCount equals plain countDistinct") {
    val rnd = new scala.util.Random(3)
    // hot key "h" with many duplicated values
    val rows = Seq.fill(800)(("h", rnd.nextInt(50))) ++
      Seq.fill(100)(("k", rnd.nextInt(80)))
    val df = rows.toDF("key", "v")
    val plain = df.groupBy(col("key")).agg(countDistinct(col("v")).as("n"))
      .as[(String, Long)].collect().toMap
    val skewed = Skew.skewedDistinctCount(df, "key", "v", saltFactor = 8)
      .as[(String, Long)].collect().toMap
    assert(skewed == plain)
  }
}
