package graft.ops

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Cross-operator equivalences the engine exposes as interchangeable pairs
  * (SURVEY U6, W1): array-level vs relational anti-join, array top-K vs
  * window row_number. Seeded random inputs, a few Spark jobs per case.
  */
class EquivalenceSpec extends SparkSpec {
  import spark.implicits._

  private val rnd = new scala.util.Random(7)

  test("array_except equals left_anti join semantics") {
    for (_ <- 1 to 5) {
      val a = Seq.fill(8)(rnd.nextInt(10)).distinct
      val b = Seq.fill(8)(rnd.nextInt(10)).distinct
      val arrayForm = Seq((a, b)).toDF("xs", "ys")
        .select(explode(array_except(col("xs"), col("ys"))).as("v"))
        .as[Int].collect().toSet
      val antiForm = a.toDF("v").join(b.toDF("v"), Seq("v"), "left_anti")
        .as[Int].collect().toSet
      assert(arrayForm == antiForm)
    }
  }

  test("slice(sort_array desc) top-K equals row_number window top-K") {
    import org.apache.spark.sql.expressions.Window
    for (_ <- 1 to 5) {
      // distinct scores: equal keys would make the two forms differ only in
      // tie order, which neither promises
      val scores = Seq.fill(12)(rnd.nextDouble()).distinct
      val k = 5
      val arrayForm = Seq(scores).toDF("s")
        .select(Scoring.topK(col("s"), k).as("t"))
        .as[Seq[Double]].head()
      val windowForm = scores.toDF("v")
        .withColumn("rn", row_number().over(Window.orderBy(col("v").desc)))
        .where(col("rn") <= k)
        .orderBy(col("rn"))
        .select(col("v")).as[Double].collect().toSeq
      assert(arrayForm == windowForm)
    }
  }

  test("harmonic window form equals array-fold form") {
    import org.apache.spark.sql.expressions.Window
    for (_ <- 1 to 5) {
      val scores = Seq.fill(10)(rnd.nextDouble())
      val arrayForm = Seq(scores).toDF("s")
        .select(Scoring.harmonicTopK(col("s"), 100).as("h")).as[Double].head()
      val windowForm = scores.toDF("v")
        .withColumn("rn", row_number().over(Window.orderBy(col("v").desc)))
        .select(sum(col("v") / pow(col("rn"), 2)).over().as("h"))
        .as[Double].head()
      assert(math.abs(arrayForm - windowForm) < 1e-9)
    }
  }

  test("bitmap word-popcount distinct equals countDistinct, including " +
    "bit 63") {
    // keys straddle word boundaries and hit k % 64 == 63 (the sign bit of
    // a long word — the case DuckDB's UBIGINT twin exists for)
    val keys = (Seq(0L, 1L, 63L, 64L, 127L, 128L, 191L, 4095L) ++
      Seq(63L, 127L, 0L)).map(k => (if (k % 2 == 0) "a" else "b", k))
    val df = keys.toDF("g", "k")
    val bitmap = df
      .select(col("g"), shiftright(col("k"), 6).as("w"),
        call_function("shiftleft", lit(1L),
          (col("k") % 64).cast("int")).as("bit"))
      .groupBy(col("g"), col("w"))
      .agg(call_function("bit_or", col("bit")).as("word"))
      .groupBy(col("g"))
      .agg(sum(call_function("bit_count", col("word")))
        .cast("long").as("n"))
      .as[(String, Long)].collect().toMap
    val direct = df.groupBy(col("g"))
      .agg(countDistinct(col("k")).as("n"))
      .as[(String, Long)].collect().toMap
    assert(bitmap == direct, s"$bitmap vs $direct")
  }
}
