package graft.queries

import graft.SparkSpec
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** The static (driver-decoded, broadcast-object) two-level assign must be
  * ROW-IDENTICAL to the dynamic broadcast-join plan it can replace — same
  * FP order, round6, (cos, cid) tie-breaks, top-2 coarse probe, per-cell
  * fine grouping, and null semantics. Any drift here would silently move
  * vectors between buckets in semdedup/knn/ivf.
  */
class StaticAssignSpec extends SparkSpec {
  private val dir =
    sys.env.getOrElse("SPARK_GRAFT_FIXTURE_DIR", "/root/testdata/sf0.001")

  private def asTriples(df: DataFrame): Set[(Long, Option[Long], Option[Long])] =
    df.collect().map { r =>
      (r.getLong(0),
        if (r.isNullAt(1)) None else Some(r.getLong(1)),
        if (r.isNullAt(2)) None else Some(r.getLong(2)))
    }.toSet

  test("static assign ≡ dynamic assign on the prefix centroid frame") {
    val e = SimSearch.embeds(spark, dir)
    val nc = 32
    val n1 = 6
    val cents = e.where(col("vec_id") < nc)
      .select(col("vec_id").as("cid"), col("v").as("cv"),
        (col("vec_id") < n1.toLong).as("is_coarse"))
    val dyn = asTriples(SimSearch.assignTwoLevelAgainst(e, cents))
    val st = asTriples(SimSearch.assignTwoLevelAgainstStatic(e, cents))
    assert(dyn.nonEmpty)
    assert(st == dyn)
  }

  test("static assign ≡ dynamic assign on the trained centroid frame " +
    "(bucket AND bucket2, incl. any null-bucket2 rows)") {
    val e = SimSearch.embeds(spark, dir)
    val trained = SimSearch.trainedCentroidFrame(e, e.count()).cache()
    val dyn = asTriples(SimSearch.assignTwoLevelAgainst(e, trained))
    val st = asTriples(SimSearch.assignTwoLevelAgainstStatic(e, trained))
    assert(dyn.nonEmpty)
    assert(st == dyn)
    trained.unpersist()
  }

  test("duplicated corpus (tie-heavy regime): identical assignment") {
    import spark.implicits._
    // every vector duplicated with a shifted id — duplicate centroids and
    // duplicate queries exercise the tie-break paths on both levels
    val e0 = SimSearch.embeds(spark, dir).limit(200)
    val e = e0.union(e0.select((col("vec_id") + 100000L).as("vec_id"), col("v")))
    val cents = e.where(col("vec_id") < 16 ||
        (col("vec_id") >= 100000L && col("vec_id") < 100016L))
      .select(col("vec_id").as("cid"), col("v").as("cv"),
        (pmod(col("vec_id"), lit(4L)) === 0).as("is_coarse"))
    val dyn = asTriples(SimSearch.assignTwoLevelAgainst(e, cents))
    val st = asTriples(SimSearch.assignTwoLevelAgainstStatic(e, cents))
    assert(dyn.nonEmpty)
    assert(st == dyn)
  }

  test("empty coarse set: every bucket and bucket2 is null in both paths") {
    val e = SimSearch.embeds(spark, dir).limit(50)
    val cents = e.where(col("vec_id") < 8)
      .select(col("vec_id").as("cid"), col("v").as("cv"), lit(false).as("is_coarse"))
    val dyn = asTriples(SimSearch.assignTwoLevelAgainst(e, cents))
    val st = asTriples(SimSearch.assignTwoLevelAgainstStatic(e, cents))
    assert(st == dyn)
    assert(st.forall { case (_, b, b2) => b.isEmpty && b2.isEmpty })
  }
}
