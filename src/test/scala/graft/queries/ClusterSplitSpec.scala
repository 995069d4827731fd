package graft.queries

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** The leakage-safety claim, tested both ways: the cluster-keyed split
  * never straddles a near-dup pair, AND a naive doc-hash split on the
  * same data DOES — so the zero isn't vacuous.
  */
class ClusterSplitSpec extends SparkSpec {

  private val sfDir =
    sys.env.getOrElse("SPARK_GRAFT_FIXTURE_DIR", "/root/testdata/sf0.001")

  private def assumeFixtures(): Unit =
    assume(new java.io.File(sfDir).isDirectory,
      s"fixture dir $sfDir absent — set SPARK_GRAFT_FIXTURE_DIR")

  test("cluster split: zero straddling near-dup pairs; doc-hash split " +
    "leaks on the same corpus") {
    assumeFixtures()
    val row = LlmOps.queries("q_sample_cluster_split")(spark, sfDir)
      .collect().head
    val total = row.getAs[Long]("n_train_docs") + row.getAs[Long]("n_eval_docs")
    assert(row.getAs[Long]("n_cross_pairs") == 0L, row)
    assert(total == graft.ops.Core.table(spark, sfDir, "documents").count())
    // counter-experiment: split by DOC hash instead of cluster hash —
    // near-dup pairs (distinct doc ids, same content family) land on
    // both sides. If this were also 0 the main assertion proves nothing.
    val docs = graft.ops.Core.table(spark, sfDir, "documents")
    val sigs = graft.llm.Dedup
      .minhashSigs(docs, "doc_id", "text", 3, LlmOps.MinhashSeeds).cache()
    val pairs = graft.llm.Dedup
      .lshCandidatePairs(sigs, "doc_id", bands = 4, rowsPerBand = 2)
      .where(col("est_jaccard") >= 0.5)
      .select(col("doc1"), col("doc2"))
    def docSplit(c: org.apache.spark.sql.Column) =
      pmod(graft.ops.Core.md5Hash64(concat(lit("split|"), c.cast("string"))),
        lit(10)) < 8
    val naiveCross = pairs
      .where(docSplit(col("doc1")) =!= docSplit(col("doc2")))
      .count()
    assert(naiveCross > 0L,
      "doc-hash split straddled no pairs — the fixture lost its near-dups " +
        "and the leakage test is vacuous")
  }
}
