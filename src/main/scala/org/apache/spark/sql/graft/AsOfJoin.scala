package org.apache.spark.sql.graft

import org.apache.spark.rdd.RDD
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Ascending, Attribute, BindReferences, Expression, JoinedRow, SortOrder, UnsafeProjection}
import org.apache.spark.sql.catalyst.plans.logical.{BinaryNode, LogicalPlan}
import org.apache.spark.sql.catalyst.plans.physical.{ClusteredDistribution, Distribution}
import org.apache.spark.sql.catalyst.util.TypeUtils
import org.apache.spark.sql.classic.Dataset
import org.apache.spark.sql.execution.{BinaryExecNode, SparkPlan, SparkStrategy}

/** AS-OF JOIN — the classic whole-operator gap in Spark's built-in surface
  * (SURVEY preference order (c): LogicalPlan + Strategy + SparkPlan, used
  * only because no composition of built-ins gives one-pass merge
  * semantics).
  *
  * Semantics (backward as-of, left outer): for every left row, the single
  * right row with equal key and the GREATEST right ts <= left ts; no such
  * row → right side null. Ties on (key, ts) in the right input are the
  * caller's to resolve (pre-aggregate) — the merge keeps the last seen.
  *
  * Physical: both sides hash-clustered on the key with a PINNED partition
  * count (so the two shuffles co-partition and AQE cannot coalesce them
  * apart), sorted by (key, ts); one forward merge pass per partition —
  * no buffering beyond a single candidate row. 100 TB shape: identical
  * exchange topology to a sort-merge join, but the probe is O(n+m) with
  * O(1) state instead of a per-key hash table.
  *
  * Codegen status: the exec is an interpreted island between codegen'd
  * stages, DELIBERATELY. Measured (Smoke ×3 warm, sf0.1, local[32]):
  * 0.50 s end-to-end for 100k left rows including both exchanges and
  * sorts — the merge pass is a small fraction of that, so a doProduce/
  * doConsume implementation would buy noise. The per-row work is two
  * bound-expression evals plus one UnsafeProjection; revisit only if a
  * profile ever shows this exec dominating a real plan.
  */
case class AsOfJoinPlan(left: LogicalPlan, right: LogicalPlan,
                        leftKey: Expression, rightKey: Expression,
                        leftTs: Expression, rightTs: Expression)
  extends BinaryNode {

  override def output: Seq[Attribute] =
    left.output ++ right.output.map(_.withNullability(true))

  override protected def withNewChildrenInternal(
      newLeft: LogicalPlan, newRight: LogicalPlan): LogicalPlan =
    copy(left = newLeft, right = newRight)
}

case class AsOfJoinExec(left: SparkPlan, right: SparkPlan,
                        leftKey: Expression, rightKey: Expression,
                        leftTs: Expression, rightTs: Expression)
  extends BinaryExecNode {

  override def output: Seq[Attribute] =
    left.output ++ right.output.map(_.withNullability(true))

  private def numParts = conf.numShufflePartitions

  override def requiredChildDistribution: Seq[Distribution] = Seq(
    ClusteredDistribution(Seq(leftKey), requiredNumPartitions = Some(numParts)),
    ClusteredDistribution(Seq(rightKey), requiredNumPartitions = Some(numParts)))

  override def requiredChildOrdering: Seq[Seq[SortOrder]] = Seq(
    Seq(SortOrder(leftKey, Ascending), SortOrder(leftTs, Ascending)),
    Seq(SortOrder(rightKey, Ascending), SortOrder(rightTs, Ascending)))

  override def outputOrdering: Seq[SortOrder] =
    Seq(SortOrder(leftKey, Ascending), SortOrder(leftTs, Ascending))

  override protected def doExecute(): RDD[InternalRow] = {
    val keyOrd = TypeUtils.getInterpretedOrdering(leftKey.dataType)
    val tsOrd = TypeUtils.getInterpretedOrdering(leftTs.dataType)
    val lKeyB = BindReferences.bindReference(leftKey, left.output)
    val lTsB = BindReferences.bindReference(leftTs, left.output)
    val rKeyB = BindReferences.bindReference(rightKey, right.output)
    val rTsB = BindReferences.bindReference(rightTs, right.output)
    val rightArity = right.output.size
    val outputAttrs = output

    left.execute().zipPartitions(right.execute()) { (lIt, rIt) =>
      val proj = UnsafeProjection.create(outputAttrs, outputAttrs)
      val joined = new JoinedRow
      val nullRight = new org.apache.spark.sql.catalyst.expressions
        .GenericInternalRow(rightArity)

      // single-candidate state: the best (= latest ts) right row seen for
      // the key currently being merged; rows from the iterator are reused
      // buffers, so the candidate is a copy
      var cand: InternalRow = null
      var candKey: Any = null
      var rNext: InternalRow = if (rIt.hasNext) rIt.next().copy() else null

      lIt.map { lRow =>
        val lk = lKeyB.eval(lRow)
        val lt = lTsB.eval(lRow)
        if (lk != null && lt != null) {
          // drop candidate from a previous, smaller key
          if (cand != null && keyOrd.compare(candKey, lk) != 0) { cand = null; candKey = null }
          var advance = true
          while (advance && rNext != null) {
            val rk = rKeyB.eval(rNext)
            val rt = rTsB.eval(rNext)
            val cmpK = if (rk == null) -1 else keyOrd.compare(rk, lk)
            if (rk == null || cmpK < 0) {
              rNext = if (rIt.hasNext) rIt.next().copy() else null
            } else if (cmpK == 0 && rt != null && tsOrd.compare(rt, lt) <= 0) {
              cand = rNext; candKey = rk
              rNext = if (rIt.hasNext) rIt.next().copy() else null
            } else if (cmpK == 0 && rt == null) {
              rNext = if (rIt.hasNext) rIt.next().copy() else null
            } else {
              advance = false // right is ahead of this left row
            }
          }
        } else {
          cand = null; candKey = null
        }
        val matched = cand != null && lk != null && keyOrd.compare(candKey, lk) == 0
        proj(joined(lRow, if (matched) cand else nullRight))
      }
    }
  }

  override protected def withNewChildrenInternal(
      newLeft: SparkPlan, newRight: SparkPlan): SparkPlan =
    copy(left = newLeft, right = newRight)
}

/** Planner strategy mapping the logical as-of node to its exec. */
object AsOfJoinStrategy extends SparkStrategy {
  override def apply(plan: LogicalPlan): Seq[SparkPlan] = plan match {
    case AsOfJoinPlan(l, r, lk, rk, lt, rt) =>
      AsOfJoinExec(planLater(l), planLater(r), lk, rk, lt, rt) :: Nil
    case _ => Nil
  }
}

/** DataFrame-level API. */
object AsOf {
  /** Backward as-of left join: every `left` row picks the latest `right`
    * row with equal key and rightTs <= leftTs. Columns are resolved by name
    * against each side's analyzed plan (passing Column objects would tie
    * the call to specific expression ids).
    */
  def join(left: DataFrame, right: DataFrame,
           leftKey: String, rightKey: String,
           leftTs: String, rightTs: String): DataFrame = {
    val lPlan = left.queryExecution.analyzed
    val rPlan0 = right.queryExecution.analyzed
    // Self-join safety: sides sharing lineage (same DataFrame, or frames
    // derived from one) carry the SAME expression ids on both outputs, which
    // breaks attribute binding in the exec. Re-alias the right side behind a
    // Project (fresh expression ids) whenever the outputs overlap — the same
    // dedup Spark's own join analysis performs.
    val rPlan: LogicalPlan =
      if (lPlan.outputSet.intersect(rPlan0.outputSet).isEmpty) rPlan0
      else org.apache.spark.sql.catalyst.plans.logical.Project(
        rPlan0.output.map(a =>
          org.apache.spark.sql.catalyst.expressions.Alias(a, a.name)()), rPlan0)
    def attr(plan: LogicalPlan, name: String): Attribute =
      plan.output.find(_.name == name).getOrElse(
        throw new IllegalArgumentException(
          s"column $name not in [${plan.output.map(_.name).mkString(", ")}]"))
    val plan = AsOfJoinPlan(lPlan, rPlan,
      attr(lPlan, leftKey), attr(rPlan, rightKey),
      attr(lPlan, leftTs), attr(rPlan, rightTs))
    Dataset.ofRows(
      left.sparkSession.asInstanceOf[org.apache.spark.sql.classic.SparkSession],
      plan)
  }
}
