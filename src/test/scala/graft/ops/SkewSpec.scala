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

  test("AQE splits a skewed sort-merge join at runtime (skew=true in the " +
    "executed plan) and the result matches the unsplit join") {
    // The engine's skew posture (SCALE.md) names AQE's skew split as the
    // runtime half of the answer (salting is the planned half) — this pin
    // turns that from prose into an executed-plan fact. Thresholds are
    // scaled to test data; the TRIGGER (one partition >> median AND over
    // the byte floor) is the same decision production runs on.
    val saved = Map(
      "spark.sql.autoBroadcastJoinThreshold" -> "-1",
      "spark.sql.adaptive.autoBroadcastJoinThreshold" -> "-1",
      "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes" -> "32KB",
      "spark.sql.adaptive.advisoryPartitionSizeInBytes" -> "16KB",
      "spark.sql.adaptive.skewJoin.skewedPartitionFactor" -> "2.0"
    ).map { case (k, v) =>
      val old = spark.conf.getOption(k); spark.conf.set(k, v); k -> old
    }
    try {
      // key 0 holds ~98% of the left side's bytes: one shuffle partition
      // far beyond both the 2x-median factor and the 32KB floor. The
      // payload must be INCOMPRESSIBLE (per-row hashes, not a constant
      // pad) — shuffle blocks are lz4'd, and a constant pad deflates the
      // skewed partition below the byte floor, masking the skew.
      val left = ((1 to 40000).map(_ => 0L) ++ (1L to 64L).flatMap(k => Seq.fill(20)(k)))
        .zipWithIndex.toDF("k", "i")
        .withColumn("payload", concat(md5(col("i").cast("string")),
          md5((col("i") + 1000000).cast("string"))))
        .drop("i")
      val right = (0L to 64L).flatMap(k => Seq.fill(30)(k)).toDF("k")
        .withColumn("dim", col("k") * 2)
      val joined = left.join(right, Seq("k"))
      assert(joined.count() == 40000L * 30 + 64L * 20 * 30)
      // count()/foreach run their own QueryExecutions; drive THIS
      // Dataset's adaptive plan to completion so the string below is the
      // finalized runtime plan, not the pre-execution sketch
      val qe = joined.queryExecution
      qe.executedPlan.execute().count()
      val plan = qe.executedPlan.toString
      assert(plan.contains("skew=true"),
        s"expected AQE to mark the skewed join (skew=true):\n$plan")
    } finally saved.foreach {
      case (k, Some(v)) => spark.conf.set(k, v)
      case (k, None)    => spark.conf.unset(k)
    }
  }
}
