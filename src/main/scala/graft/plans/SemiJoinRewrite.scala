package graft.plans

import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.expressions.Attribute
import org.apache.spark.sql.catalyst.plans.{Inner, LeftSemi}
import org.apache.spark.sql.catalyst.plans.logical.{Aggregate, Join, LogicalPlan, Project}
import org.apache.spark.sql.catalyst.rules.Rule

/** Optimizer rule: turn the reference's join-then-distinct idiom into a
  * semi join (SURVEY §4 "semantic trap #1").
  *
  * Django M2M traversal emits INNER joins whose fan-out the reference
  * papers over with `.distinct()`
  * (/root/reference/tantalus/views.py:1750-1756 — "the distinct() ...
  * is necessary here, and I'm not exactly sure why"). Ported literally,
  * that plan shuffles the fan-out only to collapse it again. This rule
  * recognizes `distinct(project_L(A ⋈ B))` — an Aggregate whose
  * grouping/result expressions are plain left-side attributes over an
  * inner join — and flips the join to LEFT SEMI: B now only filters,
  * nothing is inflated.
  *
  * Correctness: a left row groups into distinct(project_L(inner)) iff it
  * has ≥1 match in B iff it survives the semi join; with no aggregate
  * functions present, the grouped outputs are identical.
  *
  * Registered by `GraftExtensions` (spark.sql.extensions) or, for an
  * existing session, `spark.experimental.extraOptimizations`.
  */
object SemiJoinRewrite extends Rule[LogicalPlan] {

  private def isDistinctOfLeftAttrs(
      groupingExprs: Seq[org.apache.spark.sql.catalyst.expressions.Expression],
      resultExprs: Seq[org.apache.spark.sql.catalyst.expressions.Expression],
      left: LogicalPlan): Boolean =
    resultExprs.forall(e => e.isInstanceOf[Attribute]) &&
      resultExprs.forall(_.references.subsetOf(left.outputSet)) &&
      groupingExprs.toSet == resultExprs.map(_.asInstanceOf[Attribute]: Any).toSet

  def apply(plan: LogicalPlan): LogicalPlan = plan.transform {
    // distinct directly over the join
    case agg @ Aggregate(g, r, Join(left, right, Inner, cond, hint), _)
        if cond.nonEmpty && isDistinctOfLeftAttrs(g, r, left) =>
      agg.copy(child = Join(left, right, LeftSemi, cond, hint))
    // distinct over a pruning projection of the join (the usual
    // post-optimization shape)
    case agg @ Aggregate(g, r, p @ Project(projList, Join(left, right, Inner, cond, hint)), _)
        if cond.nonEmpty &&
          projList.forall(_.references.subsetOf(left.outputSet)) &&
          isDistinctOfLeftAttrs(g, r, p) =>
      agg.copy(child = p.copy(child = Join(left, right, LeftSemi, cond, hint)))
  }
}

/** `spark.sql.extensions=graft.plans.GraftExtensions` */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(e: SparkSessionExtensions): Unit = {
    e.injectOptimizerRule(_ => SemiJoinRewrite)
    e.injectOptimizerRule(_ => RangeJoinBanding)
    // the native expression kernel, SQL-callable (graft_hash60, ...)
    SqlFunctions.all.foreach(e.injectFunction)
  }
}
