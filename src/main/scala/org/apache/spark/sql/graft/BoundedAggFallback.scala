package org.apache.spark.sql.graft

import org.apache.spark.rdd.RDD
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Attribute, Expression, MutableProjection, NamedExpression}
import org.apache.spark.sql.catalyst.expressions.aggregate.AggregateExpression
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.execution.SparkPlan
import org.apache.spark.sql.execution.aggregate.{BaseAggregateExec, ObjectAggregationIterator, ObjectHashAggregateExec, ScalaAggregator}
import org.apache.spark.sql.execution.metric.SQLMetrics

/** Object-hash aggregation with a PER-OPERATOR sort-fallback threshold —
  * the piece Spark's session-global
  * `spark.sql.objectHashAggregate.sortBased.fallbackThreshold` cannot
  * express.
  *
  * The scale problem, both directions (measured):
  *
  *  - Threshold too LOW for bounded buffers: graft's top-K / sketch
  *    aggregators keep O(K) state per key, so the hash map is cheap at any
  *    key count — but Spark's default flips to sort-based aggregation at
  *    128 keys per partition, sorting the whole input stream. The kNN
  *    tail's pair-sized stream disk-killed at 2M vectors until the
  *    threshold was raised (112.8 -> 80.6 s once hash mode held, r10).
  *  - Threshold too HIGH for unbounded buffers: Spark's own collect_set /
  *    collect_list ride the same exec, and their buffers grow with the
  *    group. A session-global 4M threshold let the drug-disease pipeline's
  *    per-customer part sets keep ~500k live HashSets per task in hash
  *    mode and OOM a 64 GB heap at 1000x (r11, CollectSet
  *    .createAggregationBuffer), where the 128 default would have spilled
  *    to the sort path after the first 128 keys.
  *
  * So sessions keep Spark's spill-safe default, and [[BoundedAggFallback]]
  * swaps in this exec — identical to ObjectHashAggregateExec's execution
  * (one ObjectAggregationIterator per partition; see Spark's
  * sql/core ObjectHashAggregateExec.scala) but with the threshold pinned
  * high — exactly where every aggregate buffer in the node is marked
  * [[graft.functions.BoundedBufferAgg]]. Distribution, partitioning and
  * output are inherited unchanged from [[BaseAggregateExec]], so the swap
  * is invisible to AQE stage planning and exchange reuse.
  */
case class BoundedObjectHashAggregateExec(
    requiredChildDistributionExpressions: Option[Seq[Expression]],
    isStreaming: Boolean,
    numShufflePartitions: Option[Int],
    groupingExpressions: Seq[NamedExpression],
    aggregateExpressions: Seq[AggregateExpression],
    aggregateAttributes: Seq[Attribute],
    initialInputBufferOffset: Int,
    resultExpressions: Seq[NamedExpression],
    child: SparkPlan,
    fallbackCountThreshold: Int)
  extends BaseAggregateExec {

  override lazy val metrics = Map(
    "numOutputRows" -> SQLMetrics.createMetric(sparkContext, "number of output rows"),
    "aggTime" -> SQLMetrics.createTimingMetric(sparkContext, "time in aggregation build"),
    "spillSize" -> SQLMetrics.createSizeMetric(sparkContext, "spill size"),
    "numTasksFallBacked" -> SQLMetrics.createMetric(sparkContext,
      "number of sort fallback tasks"))

  protected override def doExecute(): RDD[InternalRow] = {
    val numOutputRows = longMetric("numOutputRows")
    val aggTime = longMetric("aggTime")
    val spillSize = longMetric("spillSize")
    val numTasksFallBacked = longMetric("numTasksFallBacked")
    child.execute().mapPartitionsWithIndexInternal { (partIndex, iter) =>
      val beforeAgg = System.nanoTime()
      val hasInput = iter.hasNext
      val res = if (!hasInput && groupingExpressions.nonEmpty) {
        // grouped aggregate over an empty partition: no output rows
        Iterator.empty
      } else {
        val aggregationIterator =
          new ObjectAggregationIterator(
            partIndex,
            child.output,
            groupingExpressions,
            aggregateExpressions,
            aggregateAttributes,
            initialInputBufferOffset,
            resultExpressions,
            (expressions, inputSchema) =>
              MutableProjection.create(expressions, inputSchema),
            inputAttributes,
            iter,
            fallbackCountThreshold,
            numOutputRows,
            spillSize,
            numTasksFallBacked)
        if (!hasInput && groupingExpressions.isEmpty) {
          // global aggregate over an empty input: one zero-buffer row
          numOutputRows += 1
          Iterator.single(aggregationIterator.outputForEmptyGroupingKeyWithoutInput())
        } else {
          aggregationIterator
        }
      }
      aggTime += (System.nanoTime() - beforeAgg) / 1000000
      res
    }
  }

  override protected def withNewChildInternal(newChild: SparkPlan): SparkPlan =
    copy(child = newChild)
}

/** Physical rule (query-stage prep, so it runs under AQE before every
  * stage cut): pin a high sort-fallback threshold on object-hash
  * aggregates whose buffers are all bounded by construction; leave every
  * node carrying an unbounded builtin buffer (collect_set, collect_list,
  * percentile, ...) on the stock exec and the session's spill-safe
  * default. Streaming aggregates are excluded — their exec wiring is
  * owned by the stateful-aggregation planner.
  */
object BoundedAggFallback extends Rule[SparkPlan] {

  /** Keys per partition before hash mode yields to the sort path. Every
    * marked buffer is O(K)/fixed-width, so even millions of live buffers
    * are small; the cap only bounds the key-pointer map itself.
    */
  val BoundedThreshold: Int = 4 * 1024 * 1024

  private def bounded(ae: AggregateExpression): Boolean =
    ae.aggregateFunction match {
      case sa: ScalaAggregator[_, _, _] =>
        sa.agg.isInstanceOf[graft.functions.BoundedBufferAgg]
      case _ => false
    }

  override def apply(plan: SparkPlan): SparkPlan = plan.transformUp {
    case o: ObjectHashAggregateExec
        if !o.isStreaming && o.aggregateExpressions.nonEmpty &&
          o.aggregateExpressions.forall(bounded) =>
      BoundedObjectHashAggregateExec(
        o.requiredChildDistributionExpressions, o.isStreaming,
        o.numShufflePartitions, o.groupingExpressions,
        o.aggregateExpressions, o.aggregateAttributes,
        o.initialInputBufferOffset, o.resultExpressions, o.child,
        BoundedThreshold)
  }
}
