package org.apache.spark.sql.graft

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{ExpectsInputTypes, Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types.{AbstractDataType, ArrayType, DataType, LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** All k MinHash family minima of one document in ONE compiled pass —
  * the per-row (stateless / shuffle-free) streaming signature path's hot
  * loop as a native expression.
  *
  * The Column form it replaces (Dedup.rowMinhashSigs pre-r15-opt) was
  * `transform(array_distinct(shingles(text, n)), w => md5Hash64(w) % P)`
  * materialized per row, then k × `array_min(transform(hws, ...))` —
  * every lambda interpreted per element (higher-order functions sit
  * outside whole-stage codegen), plus the md5 spelled as
  * conv(substring(md5(w), 1, 15), 16, 10) through string round-trips.
  * On the stream screens that work is pinned to the arrival scan's ONE
  * task by the zero-shuffle contract, so expression cost is wall-clock
  * 1:1 (q_stream_lsh_batch: ~4.5 task-seconds ≈ its whole 3.3 s wall).
  *
  * Value contract (oracle-pinned — the DuckDB twins rebuild the bitsets
  * from these exact values):
  *   tokens   = split(text, " ")  — Java regex semantics, empties kept;
  *   shingles = windows of n tokens joined by single spaces (texts
  *              shorter than n tokens have none);
  *   h(w)     = first 15 hex chars of md5(utf8(w)) as a long, mod P
  *              (P = 2³¹−1)  — ≡ Core.md5Hash64(w) % P;
  *   out[i]   = min over shingles of (A(i)·h + B(i)) mod P,
  *              null array when the text has no shingles (≡ array_min
  *              over an empty transform) or the text itself is null.
  * `array_distinct` in the old form is value-irrelevant here: a min over
  * a multiset equals the min over its support.
  * RowMinhashSpec pins equality against the lambda form; DedupSpec's
  * row-sig ≡ grouped-sig pin covers it end-to-end.
  */
case class RowMinhash(child: Expression, n: Int,
    aConsts: Seq[Long], bConsts: Seq[Long])
  extends UnaryExpression with ExpectsInputTypes {

  require(n >= 1, "shingle width must be >= 1")
  require(aConsts.length == bConsts.length && aConsts.nonEmpty,
    "one (A, B) pair per family member")

  override def inputTypes: Seq[AbstractDataType] = Seq(StringType)
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def nullable: Boolean = true
  override def prettyName: String = "graft_row_minhash"

  @transient private lazy val aArr = aConsts.toArray
  @transient private lazy val bArr = bConsts.toArray

  override def nullSafeEval(input: Any): Any =
    RowMinhash.compute(input.asInstanceOf[UTF8String], n, aArr, bArr)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val aRef = ctx.addReferenceObj("aConsts", aArr, "long[]")
    val bRef = ctx.addReferenceObj("bConsts", bArr, "long[]")
    nullSafeCodeGen(ctx, ev, in => {
      val res = ctx.freshName("res")
      s"""
         |org.apache.spark.sql.catalyst.util.GenericArrayData $res =
         |  org.apache.spark.sql.graft.RowMinhash.compute($in, $n, $aRef, $bRef);
         |if ($res == null) { ${ev.isNull} = true; } else { ${ev.value} = $res; }
       """.stripMargin
    })
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object RowMinhash {
  val P = 2147483647L

  private val md = new ThreadLocal[java.security.MessageDigest] {
    override def initialValue(): java.security.MessageDigest =
      java.security.MessageDigest.getInstance("MD5")
  }

  /** ≡ Core.md5Hash64(s): the first 15 hex chars of md5(s) as a long —
    * bytes 0..6 unsigned big-endian, then the high nibble of byte 7
    * (15 hex digits = 60 bits, always >= 0).
    */
  private def md5Hash64(bytes: Array[Byte]): Long = {
    val d = md.get()
    d.reset()
    val dig = d.digest(bytes)
    var v = 0L
    var j = 0
    while (j < 7) { v = (v << 8) | (dig(j) & 0xffL); j += 1 }
    (v << 4) | ((dig(7) >> 4) & 0xfL)
  }

  /** One pass: tokenize, slide the n-window, md5 each joined shingle,
    * fold every family min. Returns null when the text has no shingles.
    */
  def compute(text: UTF8String, n: Int,
      a: Array[Long], b: Array[Long]): GenericArrayData = {
    // Spark's split(text, " ") keeps empty tokens (Pattern.split with
    // limit -1) — String.split(regex, -1) matches exactly.
    // Valid-UTF-8 assumption (r15 ADVICE): the UTF8String→String→UTF-8
    // round-trip below re-encodes invalid byte sequences with replacement
    // chars, so such inputs would hash differently from the old
    // byte-level Spark md5 path. Valid UTF-8 (all fixture and any
    // well-formed text) round-trips byte-exactly; parquet string columns
    // are UTF-8 by spec, so the assumption holds for every table source.
    val toks = text.toString.split(" ", -1)
    val m = toks.length - n + 1
    if (m <= 0) return null
    val k = a.length
    val mins = new Array[Long](k)
    java.util.Arrays.fill(mins, Long.MaxValue)
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
      val h = md5Hash64(
        sb.toString.getBytes(java.nio.charset.StandardCharsets.UTF_8)) % P
      var f = 0
      while (f < k) {
        val v = (a(f) * h + b(f)) % P
        if (v < mins(f)) mins(f) = v
        f += 1
      }
      i += 1
    }
    new GenericArrayData(mins)
  }

  /** Column form: array of the k family minima (null when no shingles). */
  def rowMinhash(text: Column, n: Int,
      aConsts: Seq[Long], bConsts: Seq[Long]): Column =
    GraftSql.column(RowMinhash(GraftSql.expression(text), n, aConsts, bConsts))
}
