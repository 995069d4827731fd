package org.apache.spark.sql.graft

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, ImplicitCastInputTypes}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.classic.ExpressionUtils
import org.apache.spark.sql.types.{AbstractDataType, ArrayType, DataType, DoubleType}

/** Native dot product over two `array<double>` columns.
  *
  * The built-in HOF form `aggregate(zip_with(a, b, _*_), 0d, _+_)` allocates
  * an intermediate array and dispatches the lambda per element — measured
  * ~30× slower on the brute-force all-pairs cosine at sf0.1 (12.5M pairs ×
  * 64 dims). This expression is a tight primitive loop in both the
  * interpreted and whole-stage-codegen paths: no allocation, no virtual
  * calls (SURVEY §7.3 reserved exactly this slot: "custom Expression for
  * cosine only if built-in HOF proves too slow").
  *
  * Lives under org.apache.spark.sql because ExpectsInputTypes' contract
  * (AbstractDataType) is private[sql]; ImplicitCastInputTypes buys the
  * float-array → double-array coercion for free.
  *
  * Semantics: null input array → null; element nulls are not expected
  * (embedding vectors are dense). Lengths may differ — the shorter length
  * wins (zip semantics).
  */
case class DotProduct(left: Expression, right: Expression)
  extends BinaryExpression with ImplicitCastInputTypes {

  override def inputTypes: Seq[AbstractDataType] =
    Seq(ArrayType(DoubleType), ArrayType(DoubleType))

  override def dataType: DataType = DoubleType

  override def prettyName: String = "graft_dot"

  override def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    val n = math.min(x.numElements(), y.numElements())
    var s = 0.0
    var i = 0
    while (i < n) { s += x.getDouble(i) * y.getDouble(i); i += 1 }
    s
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val i = ctx.freshName("i")
      val n = ctx.freshName("n")
      val s = ctx.freshName("s")
      s"""
         |int $n = java.lang.Math.min($a.numElements(), $b.numElements());
         |double $s = 0.0;
         |for (int $i = 0; $i < $n; $i++) {
         |  $s += $a.getDouble($i) * $b.getDouble($i);
         |}
         |${ev.value} = $s;
       """.stripMargin
    })

  override protected def withNewChildrenInternal(newLeft: Expression,
                                                 newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}

/** Column-level access to private[sql] plumbing for the graft engine. */
object GraftSql {
  def column(e: Expression): Column = ExpressionUtils.column(e)
  def expression(c: Column): Expression = ExpressionUtils.expression(c)

  /** Codegen'd dot product of two array<double> columns. */
  def dotFast(a: Column, b: Column): Column =
    column(DotProduct(expression(a), expression(b)))

  /** DEFLATE-compressed byte count of a string column. */
  def deflateLen(s: Column): Column =
    column(DeflateLen(expression(s)))

  /** Codegen'd max-cosine centroid argmax (see ArgmaxCos). `exclude` is a
    * bigint column of one centroid id to skip, lit(-1L) for none.
    */
  def argmaxCos(cents: Column, v: Column, nrm: Column, exclude: Column): Column =
    column(ArgmaxCos(expression(cents), expression(v), expression(nrm),
      expression(exclude)))

  /** Per-row (bucket, bucket2) against a driver-decoded broadcast
    * two-level centroid index (see TwoLevelAssign).
    */
  def twoLevelAssign(v: Column,
      bc: org.apache.spark.broadcast.Broadcast[TwoLevelIndex]): Column =
    column(TwoLevelAssign(expression(v), bc))

  /** Per-row top-k cosine neighbours (excluding selfId) against a
    * broadcast CosIndex — output ≡ TopKPairAgg.topK over the all-pairs
    * cosine relation (see CosTopK).
    */
  def cosTopK(v: Column, selfId: Column, k: Int,
      bc: org.apache.spark.broadcast.Broadcast[CosIndex]): Column =
    column(CosTopK(expression(v), expression(selfId), k, bc))

  /** Per-row (id > selfId, cos >= threshold) neighbour list against a
    * broadcast CosIndex (see CosPairsAbove).
    */
  def cosPairsAbove(v: Column, selfId: Column, threshold: Double,
      bc: org.apache.spark.broadcast.Broadcast[CosIndex]): Column =
    column(CosPairsAbove(expression(v), expression(selfId), threshold, bc))

  /** round6 cosine between two stored ids (null when either is absent)
    * against a broadcast CosIndex (see CosBetween).
    */
  def cosBetween(id1: Column, id2: Column,
      bc: org.apache.spark.broadcast.Broadcast[CosIndex]): Column =
    column(CosBetween(expression(id1), expression(id2), bc))

  /** BPE merge rules applied in order over a symbol array — one compiled
    * pass per rule (see BpeMerge; ≡ the foldLeft of aggregate-lambda
    * mergeOnce passes it replaces).
    */
  def bpeMerge(syms: Column, rules: Seq[(String, String)]): Column =
    column(BpeMerge(expression(syms), rules))

  /** Word n-gram shingles of a text column in one compiled pass (see
    * Shingles; ≡ the transform/slice/concat_ws lambda it replaces).
    */
  def shingles(text: Column, n: Int): Column =
    column(Shingles(expression(text), n))

  /** The portable 60-bit md5 hash as one compiled digest (see Md5Hash64;
    * ≡ conv(substring(md5(c), 1, 15), 16, 10) cast long).
    */
  def md5Hash64(c: Column): Column =
    column(Md5Hash64(expression(c)))

  /** All sign-LSH band buckets of a vector in one compiled pass (see
    * SignBuckets; ≡ the per-plane dotConst sign-bit projection + band
    * packing it replaces).
    */
  def signBuckets(v: Column, planes: Array[Array[Double]], bits: Int): Column =
    column(SignBuckets(expression(v), planes, bits))
}
