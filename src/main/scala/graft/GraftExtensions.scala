package graft

import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo, Literal}
import org.apache.spark.sql.graft.{DotProduct, RollingHash}

/** Engine extension point: registers the custom Catalyst expressions with
  * the session so they resolve from SQL and `expr(...)` strings.
  *
  * Activate with `.config("spark.sql.extensions", "graft.GraftExtensions")`
  * (any number of sessions; injection is idempotent per session build).
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(ext: SparkSessionExtensions): Unit = {
    ext.injectFunction((
      FunctionIdentifier("graft_dot"),
      new ExpressionInfo(classOf[DotProduct].getName, "graft_dot"),
      (children: Seq[Expression]) => DotProduct(children.head, children(1))))
    ext.injectFunction((
      FunctionIdentifier("graft_rolling_hash"),
      new ExpressionInfo(classOf[RollingHash].getName, "graft_rolling_hash"),
      (children: Seq[Expression]) => children(1) match {
        case Literal(k: Int, _) => RollingHash(children.head, k)
        case other => throw new IllegalArgumentException(
          s"graft_rolling_hash(arr, k): k must be an integer literal, got $other")
      }))
    ext.injectOptimizerRule(_ => org.apache.spark.sql.graft.RewriteTopK)
    ext.injectPlannerStrategy(_ => org.apache.spark.sql.graft.AsOfJoinStrategy)
    // per-operator object-agg fallback threshold: bounded-buffer udafs get
    // hash mode at any key count; unbounded builtins keep the spill-safe
    // session default (see BoundedAggFallback's scaladoc for both failure
    // modes, each measured)
    ext.injectQueryStagePrepRule(_ => org.apache.spark.sql.graft.BoundedAggFallback)
  }
}
