package graft.queries

import graft.{SparkEntry, SparkSpec}
import org.apache.spark.sql.functions._

/** q_sim_ann_lsh_dedup — the dedup-first composition of the scale-adaptive
  * LSH. The candidate/match counts must equal the plain scaled path's on
  * ANY corpus (the collapse is exact, not approximate), and on a corpus
  * WITH duplicate families the rep count must actually shrink — the whole
  * point of composing the collapse ahead of the pair join. The fixtures
  * ship zero exact-duplicate vectors (measured r11), so the family regime
  * is exercised on a derived corpus: the fixture unioned with itself under
  * offset ids, every vector a 2-member signature family.
  */
class DedupLshSpec extends SparkSpec {

  private val sfDir =
    sys.env.getOrElse("SPARK_GRAFT_FIXTURE_DIR", "/root/testdata/sf0.001")

  private def assumeFixtures(): Unit =
    assume(new java.io.File(sfDir).isDirectory,
      s"fixture dir $sfDir absent — set SPARK_GRAFT_FIXTURE_DIR")

  private def summary(dir: String, q: String): Map[String, Long] = {
    val row = SparkEntry.queries(q)(spark, dir).collect().head
    row.schema.fieldNames.zipWithIndex.map { case (f, i) =>
      f -> row.getLong(i)
    }.toMap
  }

  test("dedup-first composition ≡ scaled path on the shipped fixture " +
    "(no-family regime: n_rep = n_vec, counts identical)") {
    assumeFixtures()
    val scaled = summary(sfDir, "q_sim_ann_lsh_scaled")
    val dedup = summary(sfDir, "q_sim_ann_lsh_dedup")
    assert(dedup("n_vec") == scaled("n_vec"))
    assert(dedup("bits_per_band") == scaled("bits_per_band"))
    assert(dedup("n_bands") == scaled("n_bands"))
    assert(dedup("n_cand") == scaled("n_cand"),
      s"candidate count diverged: $dedup vs $scaled")
    assert(dedup("n_match") == scaled("n_match"))
  }

  test("duplicated corpus: families collapse (n_rep < n_vec) and the " +
    "composed counts still equal the direct scaled path") {
    assumeFixtures()
    val dir = java.nio.file.Files.createTempDirectory("graft_lsh_dedup")
      .toString
    val e = graft.ops.Core.table(spark, sfDir, "embeddings")
    val n0 = e.count()
    // exact-duplicate families of size 2: same embedding, offset id —
    // identical sign bits in every band by construction
    e.union(e.withColumn("vec_id", col("vec_id") + lit(1000000L)))
      .write.mode("overwrite").parquet(s"$dir/embeddings.parquet")
    val scaled = summary(dir, "q_sim_ann_lsh_scaled")
    val dedup = summary(dir, "q_sim_ann_lsh_dedup")
    assert(dedup("n_vec") == 2 * n0)
    // every vector sits in a ≥2-member family; natural signature
    // collisions may merge further, so ≤ n0 is the exact bound
    assert(dedup("n_rep") <= n0,
      s"families did not collapse: n_rep=${dedup("n_rep")} n0=$n0")
    assert(dedup("n_cand") == scaled("n_cand"),
      s"candidate count diverged on the family corpus: $dedup vs $scaled")
    assert(dedup("n_match") == scaled("n_match"))
    // duplicate pairs are cos=1.0 ≥ τ: at least one match per family
    assert(dedup("n_match") >= n0)
  }
}
