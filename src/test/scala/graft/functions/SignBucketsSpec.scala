package graft.functions

import graft.SparkSpec
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import graft.llm.Vectors
import graft.queries.SimSearch

/** SignBuckets value contract: the compiled band-bucket pass ≡ the
  * verbatim pre-r16 per-plane dotConst sign-bit projection + packing,
  * on real fixture embeddings, for more than one bits/bands split.
  */
class SignBucketsSpec extends SparkSpec {
  import spark.implicits._

  // the pre-r16 scaledLshBanded body, verbatim (modulo the count-derived
  // config, which is passed in)
  private def lambdaBanded(e: DataFrame, bits: Int, bands: Int): DataFrame = {
    val used = bands * bits
    val bitCols = (0 until used).map { i =>
      (Vectors.dotConst(col("v"), SimSearch.AllPlanes(i)) >= 0)
        .cast("long").as(s"b$i")
    }
    val sig = e.select(col("vec_id") +: bitCols: _*)
    val bandStructs = array((0 until bands).map { b =>
      val bucket = (0 until bits)
        .map(r => col(s"b${b * bits + r}") * lit(1L << (bits - 1 - r)))
        .reduce(_ + _)
      struct(lit(b).as("band"), bucket.as("bucket"))
    }: _*)
    sig
      .select(col("vec_id"), explode(bandStructs).as("bb"))
      .select(col("vec_id"), col("bb.band").as("band"),
        col("bb.bucket").as("bucket"))
  }

  private def compiledBanded(e: DataFrame, bits: Int, bands: Int): DataFrame = {
    val planeArr = SimSearch.AllPlanes.take(bands * bits)
      .map(_.map(_.toDouble).toArray).toArray
    e.select(col("vec_id"),
        org.apache.spark.sql.graft.GraftSql
          .signBuckets(col("v"), planeArr, bits).as("bk"))
      .select(col("vec_id"), posexplode(col("bk")))
      .select(col("vec_id"), col("pos").as("band"), col("col").as("bucket"))
  }

  test("compiled ≡ per-plane literal form on fixture embeddings, " +
    "multiple bits/bands configs") {
    val dir = sys.env.getOrElse("SPARK_GRAFT_FIXTURE_DIR",
      "/root/testdata/sf0.001")
    assume(new java.io.File(dir).isDirectory)
    val e = spark.read.parquet(s"$dir/embeddings.parquet")
      .select(col("vec_id"),
        transform(col("embedding"), x => x.cast("double")).as("v"))
    Seq((4, 4), (7, 3), (24, 4)).foreach { case (bits, bands) =>
      val a = lambdaBanded(e, bits, bands)
        .orderBy(col("vec_id"), col("band")).collect().map(_.toSeq).toSeq
      val c = compiledBanded(e, bits, bands)
        .orderBy(col("vec_id"), col("band")).collect().map(_.toSeq).toSeq
      assert(a.nonEmpty && a == c, s"bits=$bits bands=$bands")
    }
  }
}
