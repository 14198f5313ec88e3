package graft.rules

import org.apache.spark.sql.catalyst.expressions.Literal
import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.types.StringType

import graft.functions.RollingHash

/** Optimizer rule: constant-fold [[RollingHash]] over literal input —
  * Catalyst's built-in ConstantFolding only folds expressions it can
  * prove foldable, and a custom expression advertises that through
  * `foldable`; this rule demonstrates the `Rule[LogicalPlan]`
  * extension point by folding eagerly regardless (e.g. a literal
  * salt/fingerprint seed in a filter becomes a plain Literal before
  * pushdown, so the scan-level filter API can accept it).
  *
  * Inject at build time via `GraftExtensions`
  * (`spark.sql.extensions=graft.GraftExtensions`) or on a live session
  * with `spark.experimental.extraOptimizations`.
  */
object FoldRollingHash extends Rule[LogicalPlan] {
  override def apply(plan: LogicalPlan): LogicalPlan =
    plan.transformAllExpressions {
      case rh @ RollingHash(l @ Literal(_, StringType), _, _)
          if l.value != null =>
        Literal(rh.hashOf(l.value), rh.dataType)
    }
}
