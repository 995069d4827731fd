package graft.sources

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Dynamic partition pruning: the runtime twin of static partition pruning
  * (SourcesSpec pins the static case). At 100 TB a fact table is laid out
  * `partitionBy(date/shard)` and the filter arrives via a DIM join, not a
  * literal — DPP turns the dim's broadcast result into a partition filter
  * on the fact scan, so only the matching directories are read at all.
  * Like the AQE skew pin (SkewSpec), this is an executed-plan fact, not
  * prose: the fact scan must carry a dynamicpruning expression.
  */
class DynamicPruningSpec extends SparkSpec {
  import spark.implicits._

  test("a selective dim filter prunes fact partitions at runtime " +
    "(dynamicpruning on the fact scan)") {
    val root = java.nio.file.Files.createTempDirectory("graft_dpp").toString
    (0L until 20L).flatMap(p => (1 to 50).map(i => (p, p * 1000 + i)))
      .toDF("p", "v")
      .write.partitionBy("p").parquet(s"$root/fact")
    val fact = spark.read.parquet(s"$root/fact")
    // dim's p must match the INFERRED partition-column type (int for these
    // directory values) — a cast on the fact's partition key blocks DPP.
    // The dim must also be a real scan: a local Seq's filter constant-folds
    // into the LocalRelation, leaving no selective predicate for the
    // pruning rule to see.
    (0 until 20).map(p => (p, if (p == 3 || p == 7) "keep" else "drop"))
      .toDF("p", "tag")
      .write.parquet(s"$root/dim")
    val dim = spark.read.parquet(s"$root/dim").where(col("tag") === "keep")

    val joined = fact.join(dim, Seq("p")).select(col("p"), col("v"))
    val qe = joined.queryExecution
    qe.executedPlan.execute().count()
    val plan = qe.executedPlan.toString
    assert(plan.contains("dynamicpruning"),
      s"expected a dynamicpruning partition filter on the fact scan:\n$plan")
    assert(joined.count() == 100L)
    assert(joined.select(countDistinct(col("p"))).as[Long].head() == 2L)
  }
}
