package graft.queries

import graft.SparkSpec
import org.apache.spark.sql.DataFrame

/** The staged (materialize-then-read) drug-disease pipeline must be
  * row-identical to the recompute plan — the sub-threshold path is what the
  * sf0.01 oracle gate exercises, so the staged path (the one that actually
  * runs at scale) needs its own equivalence pin. Forcing `stageRows = 0`
  * runs the full stage/write/read-back machinery at fixture scale.
  */
class PipelineStagedSpec extends SparkSpec {
  private val dir =
    sys.env.getOrElse("SPARK_GRAFT_FIXTURE_DIR", "/root/testdata/sf0.001")

  private def rows(df: DataFrame): Set[(Long, Long, Long, Double)] =
    df.collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getDouble(3)))
      .toSet

  // One staged run shared by both tests — each test is self-contained under
  // a test-name filter (the layout test previously depended on the
  // equivalence test having populated the scratch first).
  private lazy val stagedRows: Set[(Long, Long, Long, Double)] =
    rows(Reference.drugDiseasePipeline(spark, dir, stageRows = 0L))

  test("staged path is row-identical to the recompute path") {
    val direct = Reference.drugDiseasePipeline(spark, dir)
    val dRows = rows(direct)
    assert(dRows.nonEmpty, "fixture produced no hypotheses — spec is vacuous")
    assert(stagedRows == dRows)
  }

  test("staged scratch holds the five key-sized frames plus the fact join") {
    assert(stagedRows.nonEmpty) // forces the staged run (writes the scratch)
    val root = new java.io.File(
      Relational.scratchPath(spark, dir, "pipeline_dd"))
    val expected = Set("lines", "supp_parts", "pairs", "owned_parts",
      "cust_parts", "part_mask", "cust_mask")
    val present = Option(root.listFiles()).getOrElse(Array.empty)
      .filter(_.isDirectory).map(_.getName).toSet
    assert(expected.subsetOf(present), s"missing staged dirs: ${expected -- present}")
  }
}
