package graft

import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo}
import org.apache.spark.sql.graft.DotProduct

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
    ext.injectOptimizerRule(_ => org.apache.spark.sql.graft.RewriteTopK)
  }
}
