package org.apache.spark.sql.graft

import java.util.zip.Deflater

import org.apache.spark.sql.catalyst.expressions.{Expression, ImplicitCastInputTypes, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{AbstractDataType, DataType, LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Compressed size of a string under DEFLATE level 6 — the
  * compression-ratio quality signal LLM data pipelines use to catch
  * templated/repetitive text (a low deflate/raw ratio means the document
  * is mostly structure, not content; the complement of the token-entropy
  * gate, sensitive to LONG-range repetition where entropy only sees the
  * unigram histogram).
  *
  * A Scala UDF here would pay serialization plus a Deflater allocation
  * per row; this expression is codegen-friendly (a static call inside
  * whole-stage codegen) and reuses one Deflater per thread via reset().
  * Output is the deflated byte COUNT — callers derive the ratio against
  * octet_length so both numbers stay exact integers as long as possible.
  *
  * Deterministic for a fixed zlib build (the JDK pins one); there is no
  * SQL-expressible oracle, so the query carrying it is rows-only by
  * contract and the semantics are pinned by DeflateLenSpec instead.
  */
case class DeflateLen(child: Expression)
  extends UnaryExpression with ImplicitCastInputTypes {

  override def inputTypes: Seq[AbstractDataType] = Seq(StringType)

  override def dataType: DataType = LongType

  override def prettyName: String = "graft_deflate_len"

  override def nullSafeEval(input: Any): Any =
    DeflateLen.deflatedLen(input.asInstanceOf[UTF8String].getBytes)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c =>
      s"org.apache.spark.sql.graft.DeflateLen.deflatedLen($c.getBytes())")

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object DeflateLen {
  private val local = new ThreadLocal[Deflater] {
    override def initialValue(): Deflater =
      new Deflater(Deflater.DEFAULT_COMPRESSION, false)
  }

  /** Deflated byte count; one thread-local Deflater, reset per call. */
  def deflatedLen(bytes: Array[Byte]): Long = {
    val d = local.get()
    d.reset()
    d.setInput(bytes)
    d.finish()
    val buf = new Array[Byte](8192)
    var total = 0L
    while (!d.finished()) total += d.deflate(buf)
    total
  }
}
