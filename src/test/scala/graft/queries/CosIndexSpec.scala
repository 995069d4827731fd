package graft.queries

import graft.{SparkEntry, SparkSpec}
import org.apache.spark.sql.functions._

/** The broadcast-CosIndex fold expressions (CosTopK / CosPairsAbove) must
  * be ROW-IDENTICAL to the relational brute-force forms they replace —
  * same dot order, round6, (cos DESC, id ASC) top-k tie-breaks, and the
  * (v1 < v2, cos >= t) pair filter. Any drift would silently move the
  * recall gates' truth sets or the embed-cosine ground-truth pairs.
  */
class CosIndexSpec extends SparkSpec {
  private val dir =
    sys.env.getOrElse("SPARK_GRAFT_FIXTURE_DIR", "/root/testdata/sf0.001")

  test("CosTopK ≡ BNL join + TopKPairAgg top-3 truth (ranked rows)") {
    val en = SimSearch.normEmbeds(spark, dir)
    val relational = en.select(col("vec_id"), col("vn").as("a"))
      .join(en.select(col("vec_id").as("nbr"), col("vn").as("b")),
        col("vec_id") =!= col("nbr"))
      .select(col("vec_id"), col("nbr"),
        round(graft.llm.Vectors.dotFast(col("a"), col("b")), 6).as("cos"))
      .groupBy(col("vec_id"))
      .agg(graft.functions.TopKPairAgg.topK(col("cos"), col("nbr"), 3).as("t"))
      .select(col("vec_id"), posexplode(col("t")))
      .select(col("vec_id"), col("pos"), col("col._1").as("cos"),
        col("col._2").as("nbr"))
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getDouble(2),
        r.getLong(3))).toSet
    val expr = en.select(col("vec_id"),
        posexplode(org.apache.spark.sql.graft.GraftSql
          .cosTopK(col("vn"), col("vec_id"), 3, SimSearch.cosIndex(spark, dir))))
      .select(col("vec_id"), col("pos"), col("col._1").as("cos"),
        col("col._2").as("nbr"))
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getDouble(2),
        r.getLong(3))).toSet
    assert(relational.nonEmpty)
    assert(expr == relational)
  }

  test("CosPairsAbove ≡ v1<v2 BNL join + threshold filter (exact rows)") {
    val en = SimSearch.normEmbeds(spark, dir)
    val relational = en.select(col("vec_id").as("v1"), col("vn").as("a"))
      .join(en.select(col("vec_id").as("v2"), col("vn").as("b")),
        col("v1") < col("v2"))
      .select(col("v1"), col("v2"),
        round(graft.llm.Vectors.dotFast(col("a"), col("b")), 6).as("cos"))
      .where(col("cos") >= SimSearch.NearDupThreshold)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
    val expr = SparkEntry.queries("q_dedup_embed_cosine")(spark, dir)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
    assert(relational.nonEmpty)
    assert(expr == relational)
  }
}
