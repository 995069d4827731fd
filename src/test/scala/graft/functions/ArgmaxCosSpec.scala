package graft.functions

import graft.SparkSpec
import graft.llm.Vectors
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** ArgmaxCos ≡ the HOF form it replaces —
  * array_max(transform(cents, c => struct(round(dot(v,cv)/(nrm·cnrm),6),
  * cid))) — including tie-breaks (higher cid), empty/null arrays, the
  * excludeCid probe-2 semantics (≡ array_max(filter(...))), and both the
  * whole-stage-codegen and interpreted eval paths. The assign kernels of
  * the IVF/semdedup/knn family rest on this identity: the oracle replays
  * the HOF semantics in SQL, so any drift here is an oracle break.
  */
class ArgmaxCosSpec extends SparkSpec {

  import spark.implicits._

  private def hofForm(cents: org.apache.spark.sql.Column,
      v: org.apache.spark.sql.Column,
      nrm: org.apache.spark.sql.Column): org.apache.spark.sql.Column =
    array_max(transform(cents, c =>
      struct(round(Vectors.dotFast(v, c.getField("cv"))
        / (nrm * c.getField("cnrm")), 6).as("cos"),
        c.getField("cid").as("cid"))))

  /** Deterministic pseudo-random corpus: ids 0..n-1, 8-dim vectors with
    * hash-derived components (some exact duplicates to force cosine
    * ties), centroid array = the first k vectors.
    */
  private def fixture(n: Int, k: Int): DataFrame = {
    val rows = (0 until n).map { id =>
      val base = if (id % 7 == 0) id - (id % 14) else id // dups every 14
      val v = (0 until 8).map(j =>
        ((base * 31 + j * 17) % 13 - 6).toDouble / 3.0)
      (id.toLong, v)
    }
    val df = rows.toDF("vec_id", "v")
    val cents = df.where(col("vec_id") < k)
      .select(struct(col("vec_id").as("cid"), col("v").as("cv"),
        sqrt(Vectors.dotFast(col("v"), col("v"))).as("cnrm")).as("c"))
      .groupBy().agg(collect_list(col("c")).as("cents"))
    df.select(col("vec_id"), col("v"),
        sqrt(Vectors.dotFast(col("v"), col("v"))).as("nrm"))
      .crossJoin(broadcast(cents))
  }

  private def assertIdentical(): Unit = {
    val f = fixture(200, 16)
    val both = f.select(col("vec_id"),
      Vectors.argmaxCos(col("cents"), col("v"), col("nrm"), lit(-1L)).as("native"),
      hofForm(col("cents"), col("v"), col("nrm")).as("hof"))
    val diff = both.where(
      col("native.cos") =!= col("hof.cos") ||
      col("native.cid") =!= col("hof.cid")).count()
    assert(diff == 0, s"$diff rows diverge from the HOF argmax")

    // excludeCid ≡ array_max(filter(sc, cid != excl)) — exclude each row's
    // own winner (the probe-2 shape)
    val withBest = f.select(col("vec_id"), col("v"), col("nrm"), col("cents"),
      hofForm(col("cents"), col("v"), col("nrm")).getField("cid").as("best"))
    val both2 = withBest.select(
      Vectors.argmaxCos(col("cents"), col("v"), col("nrm"), col("best"))
        .as("native2"),
      array_max(filter(
        transform(col("cents"), c =>
          struct(round(Vectors.dotFast(col("v"), c.getField("cv"))
            / (col("nrm") * c.getField("cnrm")), 6).as("cos"),
            c.getField("cid").as("cid"))),
        s => s.getField("cid") =!= col("best"))).as("hof2"))
    val diff2 = both2.where(
      col("native2.cos") =!= col("hof2.cos") ||
      col("native2.cid") =!= col("hof2.cid")).count()
    assert(diff2 == 0, s"$diff2 rows diverge on the exclude path")

    // empty centroid array → null (array_max-over-empty semantics)
    val empty = f.limit(1).select(
      Vectors.argmaxCos(
        filter(col("cents"), _ => lit(false)), col("v"), col("nrm"), lit(-1L))
        .as("r"))
    assert(empty.where(col("r").isNotNull).count() == 0)
  }

  test("native argmax ≡ HOF argmax, ties and exclusion included (codegen)") {
    assertIdentical()
  }

  test("native argmax ≡ HOF argmax under the interpreted eval path") {
    val prev = spark.conf.getOption("spark.sql.codegen.factoryMode")
    spark.conf.set("spark.sql.codegen.factoryMode", "NO_CODEGEN")
    try assertIdentical()
    finally prev match {
      case Some(p) => spark.conf.set("spark.sql.codegen.factoryMode", p)
      case None => spark.conf.unset("spark.sql.codegen.factoryMode")
    }
  }
}
