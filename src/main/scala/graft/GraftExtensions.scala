package graft

import graft.functions.{DotProduct, RollingHash}
import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.ExpressionInfo

/** SparkSessionExtensions entry point — the idiomatic way to ship this
  * engine's Catalyst additions into any session:
  *
  * {{{
  *   SparkSession.builder()
  *     .withExtensions(new GraftExtensions)          // programmatic
  *   // or: --conf spark.sql.extensions=graft.GraftExtensions
  * }}}
  *
  * Injects the native codegen expressions under stable SQL names. The
  * per-session `register()` helpers on each expression object remain
  * for sessions built elsewhere. This mirrors the reference's plugin
  * posture: the engine is a loadable module that teaches the host
  * (BOSS there, Catalyst here) new expression heads
  * (`/root/reference/Source/BOSSArrowStorageEngine.hpp:12-15`).
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(e: SparkSessionExtensions): Unit = {
    e.injectFunction((
      new FunctionIdentifier("graft_dot"),
      new ExpressionInfo(classOf[DotProduct].getName, "graft_dot"),
      (exprs: Seq[org.apache.spark.sql.catalyst.expressions.Expression]) =>
        DotProduct(exprs(0), exprs(1))))
    e.injectFunction((
      new FunctionIdentifier("graft_rolling_hash"),
      new ExpressionInfo(classOf[RollingHash].getName, "graft_rolling_hash"),
      (exprs: Seq[org.apache.spark.sql.catalyst.expressions.Expression]) =>
        RollingHash(exprs.head)))
    // Rule[LogicalPlan] extension point: specialize self-dots into a
    // single-traversal norm (bit-transparent; see CollapseSelfDot).
    e.injectOptimizerRule(_ => graft.plans.CollapseSelfDot)
    // Rule[LogicalPlan]: answer a registered grouped aggregate from
    // its incrementally maintained view, gated on table-log freshness
    // (see MaterializedViews).
    e.injectOptimizerRule(_ => graft.plans.RewriteToMaterializedView)
    // SparkStrategy extension point: plans the custom TopKPerGroupNode
    // as bounded-heap partial/final physical operators.
    e.injectPlannerStrategy(_ => graft.operators.TopKPerGroupStrategy)
  }
}
