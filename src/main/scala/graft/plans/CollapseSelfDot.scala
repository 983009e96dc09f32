package graft.plans

import graft.functions.{DotProduct, NormSquared}
import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan
import org.apache.spark.sql.catalyst.rules.Rule

/** Optimizer rule: `graft_dot(x, x)` → `graft_norm_sq(x)` whenever the
  * two sides are semantically the same deterministic expression —
  * halving the array reads on the similarity pipelines' norm
  * precomputation without anyone writing the specialized form by hand.
  *
  * This is the engine's `Rule[LogicalPlan]` extension point (SURVEY.md
  * §2b preference order (c)), injected via
  * [[graft.GraftExtensions]]/`injectOptimizerRule`. The rewrite is
  * bit-transparent: NormSquared accumulates in the same left-to-right
  * double order as DotProduct.
  */
object CollapseSelfDot extends Rule[LogicalPlan] {
  override def apply(plan: LogicalPlan): LogicalPlan =
    plan.transformAllExpressions {
      case DotProduct(l, r) if l.deterministic && l.semanticEquals(r) =>
        NormSquared(l)
    }
}
