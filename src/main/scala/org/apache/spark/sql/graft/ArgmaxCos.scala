package org.apache.spark.sql.graft

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Expression, QuaternaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.catalyst.expressions.GenericInternalRow
import org.apache.spark.sql.types._

/** Native max-cosine centroid argmax over a broadcast centroid-struct
  * array — the assign kernel of the IVF/semdedup family as ONE tight
  * loop.
  *
  * Replaces `array_max(transform(cents, c => struct(round(dot(v, c.cv) /
  * (nrm * c.cnrm), 6) AS cos, c.cid AS cid)))`: the HOF form allocates a
  * C-element struct array per ROW and dispatches the lambda per element
  * (ArrayTransform is not whole-stage-codegen'd), which at 2M vectors ×
  * 531 scored centroids measured as the dominant stage of the trained
  * assign (49.6 s of the 91 s warm semdedup wall, Probe r10). Here the
  * loop — dot, norm division, round, lexicographic (cos, cid) max —
  * generates as straight-line Java with zero per-element allocation.
  *
  * FP-IDENTICAL to the HOF form by construction: the dot sums v[i]*cv[i]
  * in the same ascending order as DotProduct; the divisor multiplies the
  * same two values in the same order; rounding calls the same
  * BigDecimal.setScale(6, HALF_UP) path as Spark's `round` (NaN/Inf pass
  * through, Spark's Round guard); the max replicates array_max's struct
  * ordering — cos compared NaN-greatest/-0.0==0.0 (nanSafeCompareDoubles),
  * ties broken toward the HIGHER cid.
  *
  * `excludeCid` skips one centroid id (−1 = none): the two-probe assign's
  * second-best coarse cell is `ArgmaxCos(..., firstBest)`, replacing
  * `array_max(filter(sc, _.cid =!= coarse))` without materializing the
  * scored array at all.
  *
  * Input contract: cents is array<struct<cid: bigint, cv: array<double>,
  * cnrm: double>> (fields read POSITIONALLY — keep that field order at
  * every construction site); null/empty cents (or every element excluded)
  * → null, matching array_max over an empty/null array.
  */
case class ArgmaxCos(cents: Expression, v: Expression, nrm: Expression,
    excludeCid: Expression) extends QuaternaryExpression {

  override def first: Expression = cents
  override def second: Expression = v
  override def third: Expression = nrm
  override def fourth: Expression = excludeCid

  override def dataType: DataType = StructType(Seq(
    StructField("cos", DoubleType, nullable = false),
    StructField("cid", LongType, nullable = false)))

  override def nullable: Boolean = true

  override def prettyName: String = "graft_argmax_cos"

  override def nullSafeEval(c: Any, vv: Any, nn: Any, ex: Any): Any = {
    val arr = c.asInstanceOf[ArrayData]
    // the query vector is read once per CENTROID: decode it to a primitive
    // array once per row (64 doubles, amortized over the ~2·√C·dim dots)
    // so the inner loop multiplies against a bounds-check-friendly
    // double[] instead of per-element ArrayData virtual calls — measured
    // 1.3-1.5× on the trained assign at sf10 (SCALE.md r11)
    val vec = vv.asInstanceOf[ArrayData].toDoubleArray()
    val n1 = nn.asInstanceOf[Double]
    val excl = ex.asInstanceOf[Long]
    var found = false
    var bestCos = 0.0
    var bestCid = 0L
    val n = arr.numElements()
    var j = 0
    while (j < n) {
      val cstruct = arr.getStruct(j, 3)
      val cid = cstruct.getLong(0)
      if (cid != excl) {
        val cv = cstruct.getArray(1)
        val cnrm = cstruct.getDouble(2)
        val m = math.min(vec.length, cv.numElements())
        var s = 0.0
        var i = 0
        while (i < m) { s += vec(i) * cv.getDouble(i); i += 1 }
        val cos = ArgmaxCos.round6(s / (n1 * cnrm))
        val cmp = ArgmaxCos.cmpDouble(cos, bestCos)
        if (!found || cmp > 0 || (cmp == 0 && cid > bestCid)) {
          found = true; bestCos = cos; bestCid = cid
        }
      }
      j += 1
    }
    if (found) new GenericInternalRow(Array[Any](bestCos, bestCid)) else null
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (c, vv, nn, ex) => {
      val j = ctx.freshName("j")
      val i = ctx.freshName("i")
      val n = ctx.freshName("n")
      val m = ctx.freshName("m")
      val s = ctx.freshName("s")
      val cos = ctx.freshName("cos")
      val cmp = ctx.freshName("cmp")
      val cid = ctx.freshName("cid")
      val cv = ctx.freshName("cv")
      val cnrm = ctx.freshName("cnrm")
      val cstruct = ctx.freshName("cstruct")
      val found = ctx.freshName("found")
      val bestCos = ctx.freshName("bestCos")
      val bestCid = ctx.freshName("bestCid")
      val cls = classOf[ArgmaxCos].getName.stripSuffix("$")
      val vd = ctx.freshName("vd")
      s"""
         |boolean $found = false;
         |double $bestCos = 0.0;
         |long $bestCid = 0L;
         |int $n = $c.numElements();
         |double[] $vd = $vv.toDoubleArray();
         |for (int $j = 0; $j < $n; $j++) {
         |  org.apache.spark.sql.catalyst.InternalRow $cstruct = $c.getStruct($j, 3);
         |  long $cid = $cstruct.getLong(0);
         |  if ($cid == $ex) continue;
         |  org.apache.spark.sql.catalyst.util.ArrayData $cv = $cstruct.getArray(1);
         |  double $cnrm = $cstruct.getDouble(2);
         |  int $m = java.lang.Math.min($vd.length, $cv.numElements());
         |  double $s = 0.0;
         |  for (int $i = 0; $i < $m; $i++) {
         |    $s += $vd[$i] * $cv.getDouble($i);
         |  }
         |  double $cos = $cls.round6($s / ($nn * $cnrm));
         |  int $cmp = $cls.cmpDouble($cos, $bestCos);
         |  if (!$found || $cmp > 0 || ($cmp == 0 && $cid > $bestCid)) {
         |    $found = true; $bestCos = $cos; $bestCid = $cid;
         |  }
         |}
         |if ($found) {
         |  ${ev.value} = new org.apache.spark.sql.catalyst.expressions.GenericInternalRow(
         |    new Object[]{$bestCos, $bestCid});
         |} else {
         |  ${ev.isNull} = true;
         |}
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      first: Expression, second: Expression,
      third: Expression, fourth: Expression): Expression =
    copy(cents = first, v = second, nrm = third, excludeCid = fourth)
}

object ArgmaxCos {
  /** Spark Round(x, 6) for doubles: NaN/Inf pass through, else
    * BigDecimal HALF_UP — the exact code path of the HOF form's round().
    */
  def round6(x: Double): Double =
    if (java.lang.Double.isNaN(x) || java.lang.Double.isInfinite(x)) x
    else java.math.BigDecimal.valueOf(x)
      .setScale(6, java.math.RoundingMode.HALF_UP).doubleValue()

  /** Spark's DoubleType ordering (nanSafeCompareDoubles): NaN greatest,
    * -0.0 == 0.0.
    */
  def cmpDouble(x: Double, y: Double): Int = {
    val xn = java.lang.Double.isNaN(x)
    val yn = java.lang.Double.isNaN(y)
    if ((xn && yn) || (x == y)) 0
    else if (xn) 1
    else if (yn) -1
    else if (x > y) 1
    else -1
  }
}
