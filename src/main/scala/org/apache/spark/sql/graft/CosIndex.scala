package org.apache.spark.sql.graft

import org.apache.spark.broadcast.Broadcast
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, GenericInternalRow, ImplicitCastInputTypes}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._

/** Driver-decoded broadcast of a whole (id, unit-vector) table — the
  * brute-force-cosine counterpart of [[TwoLevelIndex]]: one primitive
  * `long[]` / `double[][]` image of the normalized embedding table,
  * shipped once per executor, against which per-row fold expressions
  * ([[CosTopK]], [[CosPairsAbove]]) run the all-pairs loop as
  * straight-line primitive code.
  *
  * WHY (guide §2.4 / the r10 ArgmaxCos rule): the BroadcastNestedLoop
  * form of brute-force truth (`en × en` with `id =!= id` + dot + bounded
  * agg) broadcasts this SAME relation, but then materializes every one
  * of the n² joined rows — two 64-double UnsafeArrayDatas copied per
  * pair — only for the projection to reduce each row back to 16 bytes,
  * and pays a groupBy exchange on top. Folding the loop into one
  * expression removes the pair materialization AND the aggregation
  * exchange outright: the truth plan becomes a map-only pass over the
  * scan (0 Exchange, 0 Join). Measured at sf0.1 (2000 vectors): the BNL
  * + TopKPairAgg truth side costs ~2.2-2.4 s; this form ~0.2 s.
  *
  * SCALE DOMAIN — identical to the plan it replaces, by construction:
  * both broadcast the full vector table (~0.5 KB/vector, the documented
  * ~10⁷-vector regime of q_sim_ann_lsh_scaled's verify). Brute-force
  * truth gates past that size run on a SAMPLE by contract (SCALE.md
  * recallsampled); this is the fixture-scale / sample-scale kernel, not
  * a new scaling claim.
  *
  * SEMANTICS are FP-identical to the relational form: dots sum in the
  * same ascending element order as DotProduct, round6 is the same
  * BigDecimal HALF_UP path as Spark's round(x, 6), and comparisons use
  * Spark's double ordering (NaN greatest, -0.0 == 0.0) with ties broken
  * toward the LOWER id — exactly TopKPairAgg's (score DESC, id ASC)
  * contract. CosIndexSpec pins row-identity against the relational
  * forms on the fixture tables.
  */
final class CosIndex(val ids: Array[Long],
    val vecs: Array[Array[Double]]) extends Serializable {

  private def beats(c1: Double, i1: Long, c2: Double, i2: Long): Boolean = {
    val c = ArgmaxCos.cmpDouble(c1, c2)
    c > 0 || (c == 0 && i1 < i2)
  }

  /** Top-k neighbours of `v` by (cos DESC, id ASC), excluding `selfId`;
    * element struct fields (_1 cos, _2 id) best-first — the exact
    * output of TopKPairAgg.topK(cos, id, k) over the same pair set.
    */
  def topK(v: ArrayData, selfId: Long, k: Int): ArrayData = {
    val vd = v.toDoubleArray()
    val bc = new Array[Double](k)
    val bi = new Array[Long](k)
    var held = 0
    var j = 0
    while (j < ids.length) {
      val id = ids(j)
      if (id != selfId) {
        val w = vecs(j)
        val m = math.min(vd.length, w.length)
        var s = 0.0
        var i = 0
        while (i < m) { s += vd(i) * w(i); i += 1 }
        val cos = ArgmaxCos.round6(s)
        // insertion into the best-first prefix (k is tiny: 3-10)
        if (held < k || beats(cos, id, bc(held - 1), bi(held - 1))) {
          var p = if (held < k) held else k - 1
          while (p > 0 && beats(cos, id, bc(p - 1), bi(p - 1))) {
            bc(p) = bc(p - 1); bi(p) = bi(p - 1); p -= 1
          }
          bc(p) = cos; bi(p) = id
          if (held < k) held += 1
        }
      }
      j += 1
    }
    val out = new Array[Any](held)
    var r = 0
    while (r < held) {
      out(r) = new GenericInternalRow(Array[Any](bc(r), bi(r))); r += 1
    }
    new GenericArrayData(out)
  }

  // id → position, rebuilt lazily per deserialized instance (one sort per
  // executor, amortized over every pair lookup)
  @transient private lazy val byId: (Array[Long], Array[Int]) = {
    val order = ids.indices.toArray.map(i => (ids(i), i)).sortBy(_._1)
    (order.map(_._1), order.map(_._2))
  }

  private def posOf(id: Long): Int = {
    val (sid, pos) = byId
    val j = java.util.Arrays.binarySearch(sid, id)
    if (j < 0) -1 else pos(j)
  }

  /** round6 cosine between the stored vectors of two ids — the
    * fetch-join-free form of `cand ⋈ en ⋈ en` + dot: one dot per pair,
    * zero joins. Null when either id is absent (≡ the inner fetch joins
    * dropping the row).
    */
  def cosBetween(id1: Long, id2: Long): java.lang.Double = {
    val p1 = posOf(id1)
    val p2 = posOf(id2)
    if (p1 < 0 || p2 < 0) null
    else {
      val a = vecs(p1)
      val b = vecs(p2)
      val m = math.min(a.length, b.length)
      var s = 0.0
      var i = 0
      while (i < m) { s += a(i) * b(i); i += 1 }
      java.lang.Double.valueOf(ArgmaxCos.round6(s))
    }
  }

  /** Neighbours with id > selfId and cos >= threshold, as
    * array<struct<v2, cos>> — the (v1 < v2, cos >= t) all-pairs filter
    * of q_dedup_embed_cosine. The threshold compare replicates Spark's
    * double ordering (NaN >= t is TRUE there — NaN ranks greatest).
    */
  def pairsAbove(v: ArrayData, selfId: Long, threshold: Double): ArrayData = {
    val vd = v.toDoubleArray()
    val buf = scala.collection.mutable.ArrayBuffer.empty[Any]
    var j = 0
    while (j < ids.length) {
      val id = ids(j)
      if (id > selfId) {
        val w = vecs(j)
        val m = math.min(vd.length, w.length)
        var s = 0.0
        var i = 0
        while (i < m) { s += vd(i) * w(i); i += 1 }
        val cos = ArgmaxCos.round6(s)
        if (ArgmaxCos.cmpDouble(cos, threshold) >= 0)
          buf += new GenericInternalRow(Array[Any](id, cos))
      }
      j += 1
    }
    new GenericArrayData(buf.toArray)
  }
}

/** Per-row top-k cosine neighbours against a broadcast [[CosIndex]].
  * Children: (v: array<double> unit vector, selfId: bigint — excluded
  * from candidates). Null v or selfId → null (null-intolerant), matching
  * the inner-join semantics of the relational form (a null vector joins
  * nothing).
  */
case class CosTopK(v: Expression, selfId: Expression, k: Int,
    bcIndex: Broadcast[CosIndex])
  extends BinaryExpression with ImplicitCastInputTypes {
  // bcIndex as a PLAIN param (the TwoLevelAssign lesson): executors
  // rebuild expression trees via makeCopy/productIterator; a @transient
  // param would null out the codegen reference executor-side.

  override def left: Expression = v
  override def right: Expression = selfId

  override def inputTypes: Seq[AbstractDataType] =
    Seq(ArrayType(DoubleType), LongType)

  override def dataType: DataType = ArrayType(StructType(Seq(
    StructField("_1", DoubleType, nullable = false),
    StructField("_2", LongType, nullable = false))), containsNull = false)

  override def prettyName: String = "graft_cos_topk"

  override def nullSafeEval(vv: Any, id: Any): Any =
    bcIndex.value.topK(vv.asInstanceOf[ArrayData], id.asInstanceOf[Long], k)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val idxCls = classOf[CosIndex].getName
    val bcCls = classOf[Broadcast[_]].getName
    val ref = ctx.addReferenceObj("cosIdxBc", bcIndex, bcCls)
    nullSafeCodeGen(ctx, ev, (vv, id) =>
      s"${ev.value} = (($idxCls) $ref.value()).topK($vv, $id, $k);")
  }

  override protected def withNewChildrenInternal(newLeft: Expression,
      newRight: Expression): Expression =
    copy(v = newLeft, selfId = newRight)
}

/** round6 cosine between two stored ids against a broadcast [[CosIndex]]
  * — replaces the candidate-pair vector-fetch pattern (two broadcast
  * hash joins attaching vn to each side, then a dot) with one direct
  * lookup per pair: same broadcast relation, zero joins, no per-pair
  * array copies. Null when either id is absent from the index — callers
  * filter isNotNull, reproducing the inner fetch joins' row-drop.
  */
case class CosBetween(id1: Expression, id2: Expression,
    bcIndex: Broadcast[CosIndex])
  extends BinaryExpression with ImplicitCastInputTypes {

  override def left: Expression = id1
  override def right: Expression = id2

  override def inputTypes: Seq[AbstractDataType] = Seq(LongType, LongType)

  override def dataType: DataType = DoubleType

  override def nullable: Boolean = true

  override def prettyName: String = "graft_cos_between"

  override def nullSafeEval(a: Any, b: Any): Any =
    bcIndex.value.cosBetween(a.asInstanceOf[Long], b.asInstanceOf[Long])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val idxCls = classOf[CosIndex].getName
    val bcCls = classOf[Broadcast[_]].getName
    val ref = ctx.addReferenceObj("cosIdxBc", bcIndex, bcCls)
    val r = ctx.freshName("cosr")
    nullSafeCodeGen(ctx, ev, (a, b) =>
      s"""
         |java.lang.Double $r = (($idxCls) $ref.value()).cosBetween($a, $b);
         |if ($r == null) { ${ev.isNull} = true; }
         |else { ${ev.value} = $r.doubleValue(); }
       """.stripMargin)
  }

  override protected def withNewChildrenInternal(newLeft: Expression,
      newRight: Expression): Expression =
    copy(id1 = newLeft, id2 = newRight)
}

/** Per-row thresholded neighbour list (id > selfId, cos >= threshold)
  * against a broadcast [[CosIndex]] — the all-pairs near-dup filter as
  * one map-only expression.
  */
case class CosPairsAbove(v: Expression, selfId: Expression,
    threshold: Double, bcIndex: Broadcast[CosIndex])
  extends BinaryExpression with ImplicitCastInputTypes {

  override def left: Expression = v
  override def right: Expression = selfId

  override def inputTypes: Seq[AbstractDataType] =
    Seq(ArrayType(DoubleType), LongType)

  override def dataType: DataType = ArrayType(StructType(Seq(
    StructField("v2", LongType, nullable = false),
    StructField("cos", DoubleType, nullable = false))), containsNull = false)

  override def prettyName: String = "graft_cos_pairs_above"

  override def nullSafeEval(vv: Any, id: Any): Any =
    bcIndex.value.pairsAbove(vv.asInstanceOf[ArrayData],
      id.asInstanceOf[Long], threshold)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val idxCls = classOf[CosIndex].getName
    val bcCls = classOf[Broadcast[_]].getName
    val ref = ctx.addReferenceObj("cosIdxBc", bcIndex, bcCls)
    val t = ctx.freshName("thr")
    nullSafeCodeGen(ctx, ev, (vv, id) =>
      s"""
         |double $t = $threshold;
         |${ev.value} = (($idxCls) $ref.value()).pairsAbove($vv, $id, $t);
       """.stripMargin)
  }

  override protected def withNewChildrenInternal(newLeft: Expression,
      newRight: Expression): Expression =
    copy(v = newLeft, selfId = newRight)
}
