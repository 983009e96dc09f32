package graft

import org.apache.spark.sql.execution.SparkPlan
import org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec
import org.apache.spark.sql.execution.aggregate.BaseAggregateExec
import org.apache.spark.sql.execution.window.{WindowExec, WindowGroupLimitExec}
import org.apache.spark.sql.execution.{GlobalLimitExec, LocalLimitExec, TakeOrderedAndProjectExec}

/** Shared plan-shape guards for the declared-query surface.
  *
  * An unpartitioned window (`OVER (ORDER BY ...)` with no PARTITION BY)
  * forces every input row through ONE task — the single-reducer
  * collapse that melts at 100 TB. It is only legal when the window's
  * input is provably bounded: every path below it passes through an
  * aggregation or a limit (e.g. `sql_cte` ranks a 25-row nation
  * aggregate). QueriesSpec applies this to every declared query, so a
  * future query cannot silently regress into a global window. */
object PlanGuards {
  private def unwrap(p: SparkPlan): SparkPlan = p match {
    case a: AdaptiveSparkPlanExec => a.executedPlan
    case other => other
  }

  /** Is every leaf-ward path from `p` bounded by an aggregate/limit? */
  private def bounded(p: SparkPlan): Boolean = p match {
    case _: BaseAggregateExec => true
    case _: TakeOrderedAndProjectExec => true
    case _: GlobalLimitExec | _: LocalLimitExec => true
    case leaf if leaf.children.isEmpty =>
      // subquery-reusing leaves (InMemoryTableScan, ReusedExchange)
      // could hide an aggregate, but treating them as unbounded only
      // makes the guard STRICTER, never unsound
      false
    case other => other.children.forall(bounded)
  }

  /** Every unpartitioned window node whose input is NOT provably
    * bounded — offenders that would single-task a 100 TB input. */
  def unpartitionedWindows(plan: SparkPlan): Seq[String] = {
    val offenders = scala.collection.mutable.ArrayBuffer.empty[String]
    unwrap(plan).foreach {
      case w: WindowExec if w.partitionSpec.isEmpty && !bounded(w.child) =>
        offenders += w.nodeName
      case w: WindowGroupLimitExec
        if w.partitionSpec.isEmpty && !bounded(w.child) =>
        offenders += w.nodeName
      case _ => ()
    }
    offenders.toSeq
  }
}
