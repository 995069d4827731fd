package graft.sources

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Bucketed tables: the shuffle-free co-located join (the 100 TB answer for
  * a fact×fact equi-join repeated across a pipeline — pay the shuffle once
  * at write time, never at join time).
  */
class BucketingSpec extends SparkSpec {
  import spark.implicits._

  test("join of two tables bucketed on the key runs without an exchange") {
    val a = (1 to 1000).map(i => (i.toLong, i * 2.0)).toDF("k", "va")
    val b = (500 to 1500).map(i => (i.toLong, i * 3.0)).toDF("k", "vb")
    a.write.bucketBy(8, "k").sortBy("k").mode("overwrite").saveAsTable("bt_a")
    b.write.bucketBy(8, "k").sortBy("k").mode("overwrite").saveAsTable("bt_b")

    // forbid broadcast so the plan must prove co-location, not dodge it
    val saved = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    spark.conf.set("spark.sql.adaptive.autoBroadcastJoinThreshold", "-1")
    try {
      val joined = spark.table("bt_a").join(spark.table("bt_b"), Seq("k"))
        .select(col("k"), col("va"), col("vb"))
      val rows = joined.as[(Long, Double, Double)].collect()
      assert(rows.length == 501)
      assert(rows.forall { case (k, va, vb) => va == k * 2.0 && vb == k * 3.0 })

      // co-location: the final plan has NO shuffle exchange (bucket layout
      // satisfies the join's distribution requirement on both sides)
      val finalPlan = joined.queryExecution.executedPlan.toString
      assert(!finalPlan.contains("ShuffleExchange"),
        s"expected no shuffle in bucketed join plan:\n$finalPlan")
      assert(finalPlan.contains("SortMergeJoin") || finalPlan.contains("ShuffledHashJoin"))
    } finally {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", saved)
      spark.conf.unset("spark.sql.adaptive.autoBroadcastJoinThreshold")
    }
  }
}
