package org.apache.spark.sql.graft

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{ExpectsInputTypes, Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{AbstractDataType, ArrayType, DataType, LongType}

/** Karp-Rabin rolling hash over a token-hash array: all k-gram polynomial
  * hashes h_i = (Σ_j t_{i+j}·B^{k-1-j}) mod P in ONE O(n) pass — the
  * shingle-then-hash-each-window form (q_text_fingerprint) is O(n·k) string
  * building + a digest per window. Native expression with a codegen'd
  * primitive loop; the rolling update keeps every intermediate below 2⁶²,
  * so the residues are exact and reproducible in any 64-bit SQL engine via
  * the direct (non-rolling) formula.
  *
  * Input contract: element values already reduced mod P (e.g.
  * md5Hash64(token) % P). Texts shorter than k yield an empty array.
  */
case class RollingHash(child: Expression, k: Int)
  extends UnaryExpression with ExpectsInputTypes {

  require(k >= 1, "window must be >= 1")

  import RollingHash.{B, P}

  private val bk: Long = {
    var x = 1L
    for (_ <- 1 until k) x = x * B % P
    x
  }

  override def inputTypes: Seq[AbstractDataType] = Seq(ArrayType(LongType))
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "graft_rolling_hash"

  override def nullSafeEval(input: Any): Any = {
    val in = input.asInstanceOf[ArrayData]
    val n = in.numElements()
    val m = math.max(n - k + 1, 0)
    val out = new Array[Long](m)
    if (m > 0) {
      var h = 0L
      var j = 0
      while (j < k) { h = (h * B + in.getLong(j)) % P; j += 1 }
      out(0) = h
      var i = 1
      while (i < m) {
        val drop = in.getLong(i - 1) * bk % P
        h = ((h - drop + P) * B + in.getLong(i + k - 1)) % P
        out(i) = h
        i += 1
      }
    }
    new GenericArrayData(out)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, in => {
      val n = ctx.freshName("n")
      val m = ctx.freshName("m")
      val h = ctx.freshName("h")
      val i = ctx.freshName("i")
      val j = ctx.freshName("j")
      val drop = ctx.freshName("drop")
      val out = ctx.freshName("out")
      s"""
         |int $n = $in.numElements();
         |int $m = java.lang.Math.max($n - $k + 1, 0);
         |long[] $out = new long[$m];
         |if ($m > 0) {
         |  long $h = 0L;
         |  for (int $j = 0; $j < $k; $j++) {
         |    $h = ($h * ${B}L + $in.getLong($j)) % ${P}L;
         |  }
         |  $out[0] = $h;
         |  for (int $i = 1; $i < $m; $i++) {
         |    long $drop = $in.getLong($i - 1) * ${bk}L % ${P}L;
         |    $h = (($h - $drop + ${P}L) * ${B}L + $in.getLong($i + $k - 1)) % ${P}L;
         |    $out[$i] = $h;
         |  }
         |}
         |${ev.value} = new org.apache.spark.sql.catalyst.util.GenericArrayData($out);
       """.stripMargin
    })

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object RollingHash {
  /** Polynomial base and Mersenne-prime modulus (2³¹−1): products stay
    * under 2⁶² through the rolling update.
    */
  val B = 31L
  val P = 2147483647L

  /** Column form: all k-gram rolling hashes of an array<long> column. */
  def rollingHash(tokenHashes: Column, k: Int): Column =
    GraftSql.column(RollingHash(GraftSql.expression(tokenHashes), k))
}
