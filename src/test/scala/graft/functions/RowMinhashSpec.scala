package graft.functions

import graft.SparkSpec
import graft.llm.{Dedup, TextOps}
import graft.ops.Core
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** RowMinhash (the compiled per-row MinHash kernel) must be
  * VALUE-IDENTICAL to the lambda pipeline it replaced — the stream
  * screens' oracle bitsets are built from these exact longs, so any
  * drift (tokenizer empties, md5 nibble math, family arithmetic, the
  * no-shingle null) flips oracle hashes. The reference form below IS the
  * pre-r15-opt rowMinhashSigs body, kept verbatim as the executable
  * spec.
  */
class RowMinhashSpec extends SparkSpec {

  private val seeds = 0 until 8
  private val n = 3

  private def lambdaForm(df: DataFrame, textCol: String): DataFrame = {
    val withHw = df.withColumn("hws",
      transform(array_distinct(TextOps.shingles(col(textCol), n)),
        w => Core.md5Hash64(w) % Dedup.P))
    withHw.select(df.columns.map(col) ++ seeds.map(i =>
      array_min(transform(col("hws"),
        h => (lit(Dedup.hashA(i)) * h + lit(Dedup.hashB(i))) % Dedup.P))
        .as(s"mh$i")): _*)
  }

  private def rows(df: DataFrame): Seq[Seq[Any]] =
    df.orderBy(col("id")).collect().toSeq.map(_.toSeq)

  test("equals the lambda pipeline on real fixture text") {
    val docs = spark.read
      .parquet(sys.env.getOrElse("SPARK_GRAFT_FIXTURE_DIR",
        "/root/testdata/sf0.001") + "/documents.parquet")
      .select(col("doc_id").as("id"), col("text"))
    val a = rows(lambdaForm(docs, "text"))
    val b = rows(Dedup.rowMinhashSigs(docs, "text", seeds, n))
    assert(a.nonEmpty && a == b)
  }

  test("edge texts: empties kept by the tokenizer, short and null texts") {
    import spark.implicits._
    val edge = Seq(
      (1L, "a b c d"),            // plain
      (2L, "a  b c"),             // consecutive spaces -> empty token
      (3L, " a b c "),            // leading/trailing empties
      (4L, "a b"),                // shorter than n -> null sigs
      (5L, ""),                   // empty text -> one empty token
      (6L, null.asInstanceOf[String]), // null text -> null sigs
      (7L, "a b c a b c a b c")   // duplicate shingles (distinct-irrelevance)
    ).toDF("id", "text")
    val a = rows(lambdaForm(edge, "text"))
    val b = rows(Dedup.rowMinhashSigs(edge, "text", seeds, n))
    assert(a == b)
    // the null rows really are null, not zero
    val byId = b.map(r => r.head.asInstanceOf[Long] -> r.drop(2)).toMap
    assert(byId(4L).forall(_ == null))
    assert(byId(6L).forall(_ == null))
    assert(byId(1L).forall(_ != null))
  }

  test("interpreted eval matches codegen (filter forces interpreted path)") {
    import spark.implicits._
    val df = Seq((1L, "x y z w v")).toDF("id", "text")
    val viaCol = Dedup.rowMinhashSigs(df, "text", seeds, n)
      .collect().head.toSeq.drop(2)
    val expr = org.apache.spark.sql.graft.RowMinhash(
      org.apache.spark.sql.catalyst.expressions.Literal(
        org.apache.spark.unsafe.types.UTF8String.fromString("x y z w v"),
        org.apache.spark.sql.types.StringType),
      n, seeds.map(Dedup.hashA), seeds.map(Dedup.hashB))
    val interpreted = expr.eval(org.apache.spark.sql.catalyst.InternalRow.empty)
      .asInstanceOf[org.apache.spark.sql.catalyst.util.GenericArrayData]
      .toLongArray().toSeq
    assert(viaCol == interpreted)
  }
}
