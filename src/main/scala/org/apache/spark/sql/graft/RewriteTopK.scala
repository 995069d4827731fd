package org.apache.spark.sql.graft

import org.apache.spark.sql.Encoders
import org.apache.spark.sql.catalyst.expressions.{Alias, Attribute, AttributeReference, ExprId, IsNotNull, Literal, NamedExpression, Slice, SortArray}
import org.apache.spark.sql.catalyst.expressions.aggregate.{AggregateExpression, CollectList}
import org.apache.spark.sql.catalyst.plans.logical.{Aggregate, LogicalPlan, Project}
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
  * cost. Guards: double input, non-distinct, unfiltered aggregate, K > 0.
  *
  * Two shapes fire:
  *  1. the whole pattern inside ONE Aggregate expression;
  *  2. `collect_list` in an Aggregate with the slice in the Project ABOVE
  *     it (how the DataFrame API naturally composes: `.agg(collect_list
  *     (...).as("xs")).select(slice(sort_array($"xs", desc), 1, k))`) —
  *     rewritten only when EVERY reference to the collected array is that
  *     exact slice pattern with one consistent K, so no other consumer can
  *     observe the truncation.
  *
  * Null correctness: collect_list silently drops nulls, while
  * ScalaAggregator with the primitive double encoder would deserialize
  * them as 0.0 — so for a nullable child (EVERY file-sourced column: scans
  * force nullable=true) the rewrite attaches an `IS NOT NULL` aggregate
  * filter, reproducing collect_list's drop exactly instead of bailing out
  * and losing the bounded buffer on precisely the scans that need it.
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

  private def topKAggExpression(child: org.apache.spark.sql.catalyst.expressions.Expression,
                                k: Int): AggregateExpression = {
    val uda = UserDefinedAggregator(
      new TopKAgg(k), Encoders.scalaDouble,
      nullable = false, deterministic = true)
    val nullGuard = if (child.nullable) Some(IsNotNull(child)) else None
    ScalaAggregator(uda, Seq(child))
      .toAggregateExpression(isDistinct = false, filter = nullGuard)
  }

  private def rewrite(plan: LogicalPlan): LogicalPlan = plan.transformUp {
    case agg: Aggregate =>
      agg.transformExpressions {
        case Slice(
              SortArray(
                AggregateExpression(CollectList(child, _, _), _, false, None, _),
                Literal(false, _)),
              Literal(1, IntegerType),
              Literal(k: Int, IntegerType))
            if child.dataType == DoubleType && k > 0 =>
          topKAggExpression(child, k)
      }

    case p @ Project(projList, agg: Aggregate) =>
      rewriteProjectOverAggregate(p, projList, agg)
  }

  /** Shape 2: slice(sort_array(attr, desc), 1, K) in a Project whose child
    * Aggregate computes `attr` as a plain collect_list. Safe only when the
    * attribute has no OTHER use in the projection (a size()/explode()
    * consumer would observe the truncated array).
    */
  private def rewriteProjectOverAggregate(p: Project,
      projList: Seq[NamedExpression], agg: Aggregate): LogicalPlan = {
    val collectAliases: Map[ExprId, org.apache.spark.sql.catalyst.expressions.Expression] =
      agg.aggregateExpressions.collect {
        case al @ Alias(AggregateExpression(CollectList(child, _, _), _, false, None, _), _)
            if child.dataType == DoubleType => al.exprId -> child
      }.toMap
    if (collectAliases.isEmpty) return p

    // one consistent K per attribute, or disqualify
    val kFor = scala.collection.mutable.Map[ExprId, Int]()
    val disqualified = scala.collection.mutable.Set[ExprId]()
    projList.foreach(_.foreach {
      case Slice(SortArray(a: AttributeReference, Literal(false, _)),
            Literal(1, IntegerType), Literal(k: Int, IntegerType))
          if collectAliases.contains(a.exprId) && k > 0 =>
        if (kFor.getOrElse(a.exprId, k) == k) kFor(a.exprId) = k
        else disqualified += a.exprId
      case _ => ()
    })
    val targets = kFor.toMap -- disqualified
    if (targets.isEmpty) return p

    var newAttrFor = Map[ExprId, Attribute]()
    val newAggExprs: Seq[NamedExpression] = agg.aggregateExpressions.map {
      case al @ Alias(AggregateExpression(CollectList(child, _, _), _, false, None, _), name)
          if targets.contains(al.exprId) =>
        val newAl = Alias(topKAggExpression(child, targets(al.exprId)), name)()
        newAttrFor += al.exprId -> newAl.toAttribute
        newAl
      case other => other
    }
    val newProj = projList.map(_.transform {
      case Slice(SortArray(a: AttributeReference, Literal(false, _)),
            Literal(1, IntegerType), Literal(_, IntegerType))
          if newAttrFor.contains(a.exprId) =>
        newAttrFor(a.exprId)
    }.asInstanceOf[NamedExpression])

    // any remaining reference to a rewritten attribute means the array had
    // another consumer that would observe the truncation — abandon
    val leaked = newProj.exists(_.exists {
      case a: AttributeReference => newAttrFor.contains(a.exprId)
      case _ => false
    })
    if (leaked) p
    else Project(newProj, agg.copy(aggregateExpressions = newAggExprs))
  }
}
