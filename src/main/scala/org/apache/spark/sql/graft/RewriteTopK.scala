package org.apache.spark.sql.graft

import org.apache.spark.sql.Encoders
import org.apache.spark.sql.catalyst.expressions.{Literal, Slice, SortArray}
import org.apache.spark.sql.catalyst.expressions.aggregate.{AggregateExpression, CollectList}
import org.apache.spark.sql.catalyst.plans.logical.{Aggregate, LogicalPlan}
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.execution.aggregate.{ResolveEncodersInScalaAgg, ScalaAggregator}
import org.apache.spark.sql.expressions.UserDefinedAggregator
import org.apache.spark.sql.types.{DoubleType, IntegerType}
import graft.functions.TopKAgg

/** Auto-rewrite `slice(sort_array(collect_list(x), desc), 1, K)` →
  * bounded TopKAgg (SURVEY §7.3's stretch goal).
  *
  * The collect-then-truncate form ships EVERY group value through the
  * aggregation buffer and the exchange; the rewrite bounds the buffer to K
  * on the map side with byte-for-byte identical output (top-K descending).
  * Users keep writing the declarative builtin form; plans pay the bounded
  * cost. Guards: double input, NON-NULLABLE input, non-distinct, unfiltered
  * aggregate, K > 0. The nullability guard matters for correctness:
  * collect_list silently drops nulls, while ScalaAggregator with the
  * primitive double encoder would deserialize them as 0.0 — a nullable
  * child could make the rewritten plan emit spurious 0.0 entries.
  *
  * Injected by graft.GraftExtensions via injectOptimizerRule — runs in the
  * optimizer's user-provided batch on the analyzed plan.
  */
object RewriteTopK extends Rule[LogicalPlan] {

  override def apply(plan: LogicalPlan): LogicalPlan = {
    val rewritten = rewrite(plan)
    // the analyzer's encoder-resolution pass for ScalaAggregator already ran
    // by optimization time — re-run it over the aggregates we just created
    if (rewritten.fastEquals(plan)) plan else ResolveEncodersInScalaAgg(rewritten)
  }

  private def rewrite(plan: LogicalPlan): LogicalPlan = plan.transformUp {
    case agg: Aggregate =>
      agg.transformExpressions {
        case Slice(
              SortArray(
                ae @ AggregateExpression(CollectList(child, _, _), _, false, None, _),
                Literal(false, _)),
              Literal(1, IntegerType),
              Literal(k: Int, IntegerType))
            if child.dataType == DoubleType && !child.nullable && k > 0 =>
          val uda = UserDefinedAggregator(
            new TopKAgg(k), Encoders.scalaDouble,
            nullable = false, deterministic = true)
          ScalaAggregator(uda, Seq(child))
            .toAggregateExpression(isDistinct = false, filter = ae.filter)
      }
  }
}
