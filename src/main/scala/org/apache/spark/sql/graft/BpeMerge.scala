package org.apache.spark.sql.graft

import org.apache.spark.sql.catalyst.expressions.{ExpectsInputTypes, Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{AbstractDataType, ArrayType, DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** BPE merge-rule application over a symbol array as ONE compiled pass
  * per rule (r16, guide §4).
  *
  * The Column form it replaces (Bpe.mergeOnce pre-r16) folded the array
  * with `aggregate(syms, struct(acc, prev), ...)` where every step built
  * `concat(acc, array(x))` — a fresh array COPY per element (O(len²)
  * allocations per word per rule), every lambda interpreted per element
  * (higher-order functions sit outside whole-stage codegen). Training
  * runs one such pass over the whole vocabulary per merge round and
  * application chains nMerges of them — the allocation storm was also
  * the prime suspect for q_text_bpe's anomalous 8-core run (10.9× the
  * 32-core wall where 4× is the core ratio: GC pressure scales with the
  * per-element garbage, not with cores).
  *
  * Value contract (BpeSpec pins row equality against the verbatim old
  * lambda form): scan left-to-right; a `prev` slot starts empty; an
  * element x with the slot empty fills it; x == b with prev == a emits
  * the merged symbol a‖b and empties the slot (so a merge cannot chain
  * into the next match within this pass); otherwise prev is emitted and
  * x takes the slot; a non-empty slot flushes at the end. Null elements
  * reproduce the lambda's behavior exactly: they reset the slot and
  * vanish (prev === a is null-false, the otherwise branch stores the
  * null, and a null prev reads as "slot empty"). Null array → null.
  * Rules apply IN ORDER, each over the previous rule's output — ≡ the
  * old foldLeft of mergeOnce calls.
  */
case class BpeMerge(child: Expression, rules: Seq[(String, String)])
  extends UnaryExpression with ExpectsInputTypes {

  require(rules.nonEmpty, "at least one merge rule")

  override def inputTypes: Seq[AbstractDataType] =
    Seq(ArrayType(StringType))
  override def dataType: DataType = ArrayType(StringType, containsNull = true)
  override def nullable: Boolean = true
  override def prettyName: String = "graft_bpe_merge"

  @transient private lazy val aArr: Array[UTF8String] =
    rules.map(r => UTF8String.fromString(r._1)).toArray
  @transient private lazy val bArr: Array[UTF8String] =
    rules.map(r => UTF8String.fromString(r._2)).toArray
  @transient private lazy val abArr: Array[UTF8String] =
    rules.map(r => UTF8String.fromString(r._1 + r._2)).toArray

  override def nullSafeEval(input: Any): Any =
    BpeMerge.compute(input.asInstanceOf[ArrayData], aArr, bArr, abArr)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val aRef = ctx.addReferenceObj("bpeA", aArr,
      "org.apache.spark.unsafe.types.UTF8String[]")
    val bRef = ctx.addReferenceObj("bpeB", bArr,
      "org.apache.spark.unsafe.types.UTF8String[]")
    val abRef = ctx.addReferenceObj("bpeAB", abArr,
      "org.apache.spark.unsafe.types.UTF8String[]")
    nullSafeCodeGen(ctx, ev, in => {
      s"""
         |${ev.value} = org.apache.spark.sql.graft.BpeMerge.compute(
         |  $in, $aRef, $bRef, $abRef);
       """.stripMargin
    })
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object BpeMerge {
  /** Apply every rule in order, one linear pass each; at most one output
    * buffer per pass, reused as the next pass's input.
    */
  def compute(arr: ArrayData,
      as: Array[UTF8String], bs: Array[UTF8String],
      abs: Array[UTF8String]): GenericArrayData = {
    val n = arr.numElements()
    var cur = new Array[UTF8String](n)
    var curLen = n
    var i = 0
    while (i < n) {
      cur(i) = if (arr.isNullAt(i)) null else arr.getUTF8String(i)
      i += 1
    }
    var r = 0
    while (r < as.length) {
      val a = as(r)
      val b = bs(r)
      val buf = new Array[UTF8String](curLen)
      var m = 0
      var prev: UTF8String = null
      var j = 0
      while (j < curLen) {
        val x = cur(j)
        if (prev == null) prev = x
        else if (prev.equals(a) && x != null && x.equals(b)) {
          buf(m) = abs(r); m += 1; prev = null
        } else {
          buf(m) = prev; m += 1; prev = x
        }
        j += 1
      }
      if (prev != null) { buf(m) = prev; m += 1 }
      cur = buf
      curLen = m
      r += 1
    }
    val out = new Array[Any](curLen)
    var t = 0
    while (t < curLen) { out(t) = cur(t); t += 1 }
    new GenericArrayData(out)
  }
}
