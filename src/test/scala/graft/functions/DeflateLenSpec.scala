package graft.functions

import graft.SparkSpec
import org.apache.spark.sql.functions._
import org.apache.spark.sql.graft.{DeflateLen, GraftSql}

/** Pins the compression-quality signal the rows-only
  * q_text_compress_ratio rides (no SQL oracle exists for zlib).
  */
class DeflateLenSpec extends SparkSpec {
  import spark.implicits._

  private def lens(texts: String*): Seq[Long] =
    texts.toDF("t")
      .select(GraftSql.deflateLen(col("t")))
      .as[Long].collect().toSeq

  test("templated text compresses far below varied text of the same length") {
    val boiler = "click here to subscribe now " * 40
    val varied = (0 until 40)
      .map(i => s"sentence $i about topic${i * 7 % 13} item${i * 31}")
      .mkString(" ").padTo(boiler.length, 'x').substring(0, boiler.length)
    val Seq(zb, zv) = lens(boiler, varied)
    assert(zb * 4 < boiler.length, s"boilerplate ratio not < 0.25: $zb")
    assert(zb * 3 < zv, s"templated ($zb) should compress ≫ varied ($zv)")
  }

  test("deterministic and monotone-ish: same input twice, prefix ≤ whole") {
    val t = "the quick brown fox jumps over the lazy dog " * 10
    val Seq(a, b, half) = lens(t, t, t.substring(0, t.length / 2))
    assert(a == b)
    assert(half <= a)
  }

  test("interpreted eval matches the codegen path") {
    import org.apache.spark.sql.catalyst.expressions.Literal
    val samples = Seq("", "a", "abc " * 100,
      "unicode: ünïcødé — 中文 " * 5)
    val viaDf = lens(samples: _*)
    val viaEval = samples.map { s =>
      DeflateLen(Literal(s)).eval(null).asInstanceOf[Long]
    }
    assert(viaDf == viaEval)
  }

  test("null propagates; empty string still emits the zlib framing bytes") {
    val r = Seq[(java.lang.Long, Option[String])]((1L, None), (2L, Some("")))
      .toDF("id", "t")
      .select(GraftSql.deflateLen(col("t")))
      .collect().map(r => Option(r.get(0)))
    assert(r(0).isEmpty)
    assert(r(1).exists(_.asInstanceOf[Long] > 0L))
  }
}
