package org.apache.spark.sql.graft

import org.apache.spark.sql.catalyst.expressions.{ExpectsInputTypes, Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{AbstractDataType, DataType, LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** The repo's portable 60-bit hash — `conv(substring(md5(c), 1, 15), 16,
  * 10)` — as ONE compiled digest (r16, guide §4).
  *
  * The built-in spelling ran md5 over the input, HEX-ENCODED the 16-byte
  * digest to a 32-char string, substringed 15 chars, and re-PARSED them
  * as a base-16 long — the encode/parse round-trip is pure overhead at
  * the repo's hottest sites (the per-gram base hash of every MinHash
  * signature, 4 hashes/row in count-min, 2/row in table-diff, the decon
  * gram passes, every hash-derived split/sample). This expression takes
  * the first 15 hex digits DIRECTLY off the digest bytes: bytes 0..6
  * unsigned big-endian, then the high nibble of byte 7 (60 bits, always
  * >= 0) — the identical bytes math RowMinhash uses internally, whose
  * ≡-to-the-hex-path is pinned by RowMinhashSpec; Md5Hash64Spec pins this
  * expression against the verbatim conv/substring form directly.
  *
  * Hashes the input's UTF8 BYTES (UTF8String.getBytes — no String
  * round-trip, so no UTF-8 validity caveat; ≡ md5(cast(s as binary))).
  * Null input → null (≡ the built-in chain).
  */
case class Md5Hash64(child: Expression)
  extends UnaryExpression with ExpectsInputTypes {

  override def inputTypes: Seq[AbstractDataType] = Seq(StringType)
  override def dataType: DataType = LongType
  override def prettyName: String = "graft_md5hash64"

  override def nullSafeEval(input: Any): Any =
    Md5Hash64.hash(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, in => {
      s"${ev.value} = org.apache.spark.sql.graft.Md5Hash64.hash($in);"
    })

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object Md5Hash64 {
  private val md = new ThreadLocal[java.security.MessageDigest] {
    override def initialValue(): java.security.MessageDigest =
      java.security.MessageDigest.getInstance("MD5")
  }

  def hash(s: UTF8String): Long = {
    val d = md.get()
    d.reset()
    val dig = d.digest(s.getBytes)
    var v = 0L
    var j = 0
    while (j < 7) { v = (v << 8) | (dig(j) & 0xffL); j += 1 }
    (v << 4) | ((dig(7) >> 4) & 0xfL)
  }
}
