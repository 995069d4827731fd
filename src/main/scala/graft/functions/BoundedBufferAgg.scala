package graft.functions

/** Marker for graft Aggregators whose aggregation buffer is BOUNDED by
  * construction (top-K truncation, fixed-width sketch, sized bitset) —
  * never proportional to the number of input rows in the group.
  *
  * Why it exists: ObjectHashAggregateExec holds one buffer per distinct
  * key in an in-heap hash map and only falls back to spillable sort-based
  * aggregation past `spark.sql.objectHashAggregate.sortBased.
  * fallbackThreshold` keys. For bounded buffers a huge threshold is pure
  * win (the r10 kNN tail measured 112.8 -> 80.6 s at 2M vectors once the
  * 128-key default stopped forcing a sort of the pair-sized stream). But
  * the conf is SESSION-GLOBAL, and Spark's own collect_set / collect_list
  * ride the same exec with UNBOUNDED buffers: a global 4M threshold let
  * the drug-disease pipeline's per-customer part sets pile up millions of
  * live HashSets per task and OOM a 64 GB heap at 1000x (r11, stage 23,
  * CollectSet.createAggregationBuffer) where the 128 default would have
  * spilled.
  *
  * So the threshold is not a session decision, it is a PER-OPERATOR
  * decision keyed on buffer boundedness — which Spark's conf cannot
  * express. The [[org.apache.spark.sql.graft.BoundedAggFallback]] physical
  * rule raises the threshold only for ObjectHashAggregateExec nodes whose
  * every aggregate function is marked with this trait; everything else
  * keeps Spark's spill-safe default.
  */
trait BoundedBufferAgg
