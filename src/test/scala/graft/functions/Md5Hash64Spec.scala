package graft.functions

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Md5Hash64 value contract: the compiled digest ≡ the verbatim
  * conv(substring(md5(c), 1, 15), 16, 10) chain it replaces, on fixture
  * text, generated strings, and edge cases; interpreted ≡ codegen.
  */
class Md5Hash64Spec extends SparkSpec {
  import spark.implicits._

  private def oldForm(c: org.apache.spark.sql.Column) =
    conv(substring(md5(c), 1, 15), 16, 10).cast("long")

  test("compiled ≡ conv/substring chain on edge strings and nulls") {
    val df = Seq("", "a", "hello world", "αβγ", "a|b|c", "0", " ",
      "\t\n", "long " * 100, null)
      .zipWithIndex.map { case (t, i) => (i.toLong, t) }.toDF("id", "s")
    val a = df.select(col("id"), oldForm(col("s")).as("h"))
      .orderBy(col("id")).collect().map(_.toSeq).toSeq
    val b = df.select(col("id"),
        org.apache.spark.sql.graft.GraftSql.md5Hash64(col("s")).as("h"))
      .orderBy(col("id")).collect().map(_.toSeq).toSeq
    assert(a == b)
  }

  test("compiled ≡ conv/substring chain on fixture text + derived concats") {
    val dir = sys.env.getOrElse("SPARK_GRAFT_FIXTURE_DIR",
      "/root/testdata/sf0.001")
    assume(new java.io.File(dir).isDirectory)
    val docs = spark.read.parquet(s"$dir/documents.parquet")
      .select(col("doc_id"), col("text"),
        concat(lit("split|"), col("doc_id").cast("string")).as("k"))
    val diff = docs.select(
        oldForm(col("text")).as("a"),
        org.apache.spark.sql.graft.GraftSql.md5Hash64(col("text")).as("b"),
        oldForm(col("k")).as("c"),
        org.apache.spark.sql.graft.GraftSql.md5Hash64(col("k")).as("d"))
      .where(col("a") =!= col("b") || col("c") =!= col("d"))
      .count()
    assert(diff == 0L)
  }

  test("interpreted path ≡ codegen path and always non-negative") {
    import org.apache.spark.sql.graft.Md5Hash64
    import org.apache.spark.unsafe.types.UTF8String
    val strs = Seq("", "a", "hello world", "αβγ", "x" * 500)
    val viaDf = strs.toDF("s")
      .select(col("s"), org.apache.spark.sql.graft.GraftSql.md5Hash64(col("s")).as("h"))
      .as[(String, Long)].collect().toMap
    strs.foreach { t =>
      val got = Md5Hash64.hash(UTF8String.fromString(t))
      assert(got == viaDf(t) && got >= 0L, s"'${t.take(20)}'")
    }
  }
}
