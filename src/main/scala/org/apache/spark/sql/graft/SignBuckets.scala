package org.apache.spark.sql.graft

import org.apache.spark.sql.catalyst.expressions.{ExpectsInputTypes, Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{AbstractDataType, ArrayType, DataType, DoubleType, LongType}

/** All of a vector's sign-LSH band buckets in ONE compiled pass (r16,
  * guide §4 / §7.3 driver-side).
  *
  * The Column form it replaces (scaledLshBanded pre-r16) projected 96
  * separate `dotConst(v, plane_i) >= 0` columns — each embedding a
  * 64-double ARRAY LITERAL — then re-packed them into per-band bucket
  * sums: the ANALYZED plan carried ~96 array literals and ~600 nodes,
  * and q_sim_ann_lsh_scaled's wall was 2.07 s for 1.5 task-seconds —
  * nearly all between-job planning/codegen of that tree. This expression
  * holds the plane matrix as one reference object and emits the bucket
  * array directly.
  *
  * Value contract (SignBucketsSpec pins row equality against the
  * verbatim literal form): bit r of band b is dot(v, planes[b·bits+r])
  * >= 0 — the dot the same ascending-index sequential sum as DotProduct
  * (dotConst is DotProduct against a literal), zip semantics on length
  * mismatch; bucket_b = Σ_r bit · 2^(bits-1-r); output one LongType
  * bucket per band, band = array position (the old explode's
  * struct(band, bucket) carried the same 0-based index). bands =
  * planes.length / bits, truncating — callers pass exactly bands·bits
  * planes. Null vector → null array (embeddings are dense/non-null by
  * fixture and schema; the old form emitted null BUCKETS instead, a
  * difference only a null vector could expose — none exist, and the
  * oracle equality pins the fixture behavior).
  */
case class SignBuckets(child: Expression, planes: Array[Array[Double]],
    bits: Int)
  extends UnaryExpression with ExpectsInputTypes {

  require(bits >= 1 && planes.nonEmpty && planes.length % bits == 0,
    "planes must pack into whole bands")

  override def inputTypes: Seq[AbstractDataType] =
    Seq(ArrayType(DoubleType))
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "graft_sign_buckets"

  override def nullSafeEval(input: Any): Any =
    SignBuckets.compute(input.asInstanceOf[ArrayData], planes, bits)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val pRef = ctx.addReferenceObj("signPlanes", planes, "double[][]")
    nullSafeCodeGen(ctx, ev, in => {
      s"""
         |${ev.value} = org.apache.spark.sql.graft.SignBuckets.compute(
         |  $in, $pRef, $bits);
       """.stripMargin
    })
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object SignBuckets {
  def compute(v: ArrayData, planes: Array[Array[Double]],
      bits: Int): GenericArrayData = {
    val bands = planes.length / bits
    val out = new Array[Any](bands)
    var b = 0
    while (b < bands) {
      var bucket = 0L
      var r = 0
      while (r < bits) {
        val p = planes(b * bits + r)
        val n = math.min(v.numElements(), p.length)
        var s = 0.0
        var i = 0
        while (i < n) { s += v.getDouble(i) * p(i); i += 1 }
        if (s >= 0) bucket |= 1L << (bits - 1 - r)
        r += 1
      }
      out(b) = bucket
      b += 1
    }
    new GenericArrayData(out)
  }
}
