package graft.plans

import org.apache.spark.sql.catalyst.expressions.{And, PredicateHelper}
import org.apache.spark.sql.catalyst.plans.logical.{Filter, LogicalPlan}
import org.apache.spark.sql.catalyst.rules.Rule

/** Optimizer support for the custom as-of join node: Catalyst's own
  * PushDownPredicates can't see through an unknown binary node, so without
  * this rule a Filter written ABOVE the as-of join sits there and the left
  * scan reads everything.
  *
  * Left-side conjuncts commute with the join: each output row is one left
  * row (1:1, left-preserving), its match computed independently of other
  * left rows — so dropping left rows early changes nothing downstream.
  * Right-side conjuncts must NOT push: filtering the right side changes
  * WHICH row is "latest at-or-before" (a filtered-out candidate would fall
  * back to an earlier row, not to null) — that's a different query.
  * Nondeterministic conjuncts stay put, same as Catalyst's own pushdown.
  *
  * Injected via SparkSessionExtensions.injectOptimizerRule (GraftExtensions)
  * — operator batch, so it composes with ColumnPruning and the pushed
  * predicate continues down into the scan (PushedFilters), exactly as if
  * the user had filtered before joining.
  */
object PushLeftFilterThroughAsof extends Rule[LogicalPlan] with PredicateHelper {
  override def apply(plan: LogicalPlan): LogicalPlan = plan.transformUp {
    case f @ Filter(cond, j: AsofMergeJoinPlan) =>
      val (push, keep) = splitConjunctivePredicates(cond)
        .partition(c => c.deterministic && c.references.subsetOf(j.left.outputSet))
      if (push.isEmpty) f
      else {
        val pushed = j.copy(left = Filter(push.reduce(And), j.left))
        keep.reduceOption(And).map(Filter(_, pushed)).getOrElse(pushed)
      }
  }
}
