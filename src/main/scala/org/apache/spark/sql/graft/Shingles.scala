package org.apache.spark.sql.graft

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{ExpectsInputTypes, Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode, FalseLiteral}
import org.apache.spark.sql.catalyst.expressions.codegen.Block._
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types.{AbstractDataType, ArrayType, DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Word n-gram shingles of a text column as ONE compiled pass (r16,
  * guide §4) — the single hottest scalar fold in the repo: 25 call
  * sites (the whole dedup family's shingleTable, the BM25/df-cap/passage
  * retrieval pipelines, span dedup, the LSH screens).
  *
  * The Column form it replaces (TextOps.shingles pre-r16) was
  * `transform(sequence(1, size-n+1), i => concat_ws(" ", slice(toks, i, n)))`
  * — the transform lambda interpreted per WINDOW (higher-order functions
  * sit outside whole-stage codegen), each window allocating a slice
  * array, a sequence cell, and a concat buffer.
  *
  * Value contract (ShinglesSpec pins row equality against the verbatim
  * lambda form): tokens = split(text, " ") — Java regex semantics with
  * limit -1, empty tokens KEPT; windows of n consecutive tokens joined
  * by a single space, in order; texts with fewer than n tokens (and NULL
  * texts — size(null) is null, so the old when() fell to otherwise)
  * yield the EMPTY array, never null. Valid-UTF-8 assumption as
  * RowMinhash: the UTF8String→String round-trip is byte-exact for valid
  * UTF-8 (parquet string columns by spec).
  */
case class Shingles(child: Expression, n: Int)
  extends UnaryExpression with ExpectsInputTypes {

  require(n >= 1, "shingle width must be >= 1")

  override def inputTypes: Seq[AbstractDataType] = Seq(StringType)
  override def dataType: DataType = ArrayType(StringType, containsNull = true)
  override def nullable: Boolean = false
  override def prettyName: String = "graft_shingles"

  override def eval(input: InternalRow): Any =
    Shingles.compute(child.eval(input).asInstanceOf[UTF8String], n)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val childGen = child.genCode(ctx)
    val resultCode =
      s"""
         |${ev.value} = org.apache.spark.sql.graft.Shingles.compute(
         |  ${childGen.isNull} ? null : ${childGen.value}, $n);
       """.stripMargin
    ev.copy(
      code = code"""
        |${childGen.code}
        |org.apache.spark.sql.catalyst.util.GenericArrayData ${ev.value} = null;
        |$resultCode
      """.stripMargin,
      isNull = FalseLiteral)
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object Shingles {
  private val EMPTY = new GenericArrayData(Array.empty[Any])

  def compute(text: UTF8String, n: Int): GenericArrayData = {
    if (text == null) return EMPTY
    // split(text, " ") semantics: Pattern.split with limit -1 — literal
    // single-space regex, empty tokens (incl. trailing) kept
    val toks = text.toString.split(" ", -1)
    val m = toks.length - n + 1
    if (m <= 0) return EMPTY
    val out = new Array[Any](m)
    val sb = new java.lang.StringBuilder
    var i = 0
    while (i < m) {
      sb.setLength(0)
      var j = 0
      while (j < n) {
        if (j > 0) sb.append(' ')
        sb.append(toks(i + j))
        j += 1
      }
      out(i) = UTF8String.fromString(sb.toString)
      i += 1
    }
    new GenericArrayData(out)
  }
}
