package graft.functions

import graft.SparkSpec
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Shingles (compiled word-n-gram windows) value contract: row equality
  * against the verbatim pre-r16 transform/slice/concat_ws lambda on real
  * fixture text and edge cases, and interpreted ≡ codegen.
  */
class ShinglesSpec extends SparkSpec {
  import spark.implicits._

  // the pre-r16 TextOps.shingles, verbatim — the value contract the
  // compiled expression pins against
  private def lambdaShingles(text: Column, n: Int): Column = {
    val toks = split(text, " ")
    when(size(toks) >= n,
      transform(
        sequence(lit(1), size(toks) - lit(n - 1)),
        i => concat_ws(" ", slice(toks, i, lit(n)))
      )
    ).otherwise(array().cast("array<string>"))
  }

  private val edge = Seq(
    "a b c d e", "a", "", "  ", "a  b", " leading", "trailing ",
    "one two", "x y z", "αβ γδ εζ", "a b", null
  ).zipWithIndex.map { case (t, i) => (i.toLong, t) }

  private def check(df: DataFrame, n: Int): Unit = {
    val a = df.select(col("id"), lambdaShingles(col("text"), n).as("s"))
      .orderBy(col("id")).collect().map(_.toSeq).toSeq
    val b = df.select(col("id"),
        org.apache.spark.sql.graft.GraftSql.shingles(col("text"), n).as("s"))
      .orderBy(col("id")).collect().map(_.toSeq).toSeq
    assert(a == b, s"n=$n")
  }

  test("compiled ≡ lambda on edge texts for n = 1..4 (incl. null text)") {
    val df = edge.toDF("id", "text")
    (1 to 4).foreach(n => check(df, n))
  }

  test("compiled ≡ lambda on real fixture text (n = 3)") {
    val dir = sys.env.getOrElse("SPARK_GRAFT_FIXTURE_DIR",
      "/root/testdata/sf0.001")
    assume(new java.io.File(dir).isDirectory)
    val docs = spark.read.parquet(s"$dir/documents.parquet")
      .select(col("doc_id").as("id"), col("text"))
    check(docs, 3)
    val nonEmpty = docs
      .select(org.apache.spark.sql.graft.GraftSql.shingles(col("text"), 3).as("s"))
      .where(size(col("s")) > 0).count()
    assert(nonEmpty > 0L)
  }

  test("interpreted path ≡ codegen path") {
    import org.apache.spark.sql.graft.Shingles
    import org.apache.spark.sql.catalyst.util.ArrayData
    import org.apache.spark.unsafe.types.UTF8String
    val viaDf = edge.toDF("id", "text")
      .select(col("id"),
        org.apache.spark.sql.graft.GraftSql.shingles(col("text"), 2).as("s"))
      .orderBy(col("id"))
      .as[(Long, Seq[String])].collect().toMap
    edge.foreach { case (id, t) =>
      val got = Shingles.compute(
        if (t == null) null else UTF8String.fromString(t), 2)
      val gotSeq = (0 until got.numElements())
        .map(i => got.getUTF8String(i).toString)
      assert(gotSeq == viaDf(id), s"id=$id text='$t'")
    }
  }
}
