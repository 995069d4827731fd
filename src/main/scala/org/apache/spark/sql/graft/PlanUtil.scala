package org.apache.spark.sql.graft

import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.classic.{Dataset => ClassicDataset}
import org.apache.spark.sql.execution.LogicalRDD

/** Plan-surgery helpers that need private[sql] access (the same reason
  * RunMetrics lives here).
  */
object PlanUtil {

  /** `localCheckpoint(eager = true)` minus the lineage carry-over:
    * `LogicalRDD.fromDataset` copies the checkpointed plan's CONSTRAINT
    * set onto the new leaf, and a constraint referencing an attribute
    * outside the output (e.g. a USING-join's dropped right-side key —
    * exprIds that survive because checkpoints preserve output attrs)
    * poisons every later Union over the frame:
    * `UnionBase.rewriteConstraints` rewrites each child constraint
    * through an output-only AttributeMap and dies with key-not-found on
    * the foreign attribute (hit by KnnStore.removeVectors' merge union,
    * r14). The checkpoint is still eager and still an RDD-backed leaf —
    * we only drop the origin stats/constraints, which for batch-sized
    * maintenance frames never pay for themselves anyway.
    */
  def cleanLocalCheckpoint(df: DataFrame): DataFrame = {
    val ck = df.localCheckpoint(true).asInstanceOf[ClassicDataset[Row]]
    ck.queryExecution.analyzed match {
      case lr: LogicalRDD =>
        val clean = new LogicalRDD(lr.output, lr.rdd,
          lr.outputPartitioning, lr.outputOrdering, lr.isStreaming,
          lr.stream)(ck.sparkSession, None, None)
        ClassicDataset.ofRows(ck.sparkSession, clean)
      case _ => ck
    }
  }
}
