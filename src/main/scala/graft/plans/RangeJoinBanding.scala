package graft.plans

import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.plans.Inner
import org.apache.spark.sql.catalyst.plans.logical.{Generate, Join, LogicalPlan, Project}
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.types.{IntegerType, LongType}

/** Optimizer rule: band user-written range joins.
  *
  * A join whose condition contains `abs(lt − rt) <= c` (with `lt` from
  * the left side, `rt` from the right, `c` a positive integral
  * literal) executes as a per-equi-key cross product — or, with no
  * equi keys at all, a full nested-loop join. This rule injects the
  * same banding `Ops.bandedRangeJoin` applies by hand: left rows
  * explode to the 3 candidate buckets {b−1, b, b+1} of
  * `b = floor(lt / c)`, the right side is tagged with its single
  * bucket, and `__graft_lb = __graft_rb` joins them — a qualifying
  * pair's buckets differ by at most 1, so the equi-join plus the
  * original predicate is exactly equivalent. Bucketing uses pure
  * integer arithmetic (`(t − pmod(t, c)) div c`, floor semantics for
  * any sign), so no double-rounding near bucket boundaries.
  *
  * The rewrite fires for integer/long operands (epoch micros/nanos,
  * sequence numbers). A plan already carrying `__graft_lb` is left
  * alone (idempotence under the optimizer's fixpoint loop).
  */
object RangeJoinBanding extends Rule[LogicalPlan] {

  private val LbName = "__graft_lb"
  private val RbName = "__graft_rb"

  private def isIntegral(e: Expression): Boolean =
    e.dataType == LongType || e.dataType == IntegerType

  private def asLong(e: Expression): Expression =
    if (e.dataType == LongType) e else Cast(e, LongType)

  /** floor(t / c) in exact long arithmetic: (t - pmod(t, c)) div c —
    * pmod is non-negative, so the numerator is the floor multiple and
    * integral division is exact.
    */
  private def bucket(t: Expression, c: Expression): Expression =
    IntegralDivide(Subtract(asLong(t), Pmod(asLong(t), asLong(c))), asLong(c))

  /** Match `abs(l − r) <= c` / `c >= abs(l − r)` with sides resolved
    * against the join children; returns (leftTime, rightTime, band).
    */
  private def bandPredicate(
      e: Expression,
      left: LogicalPlan,
      right: LogicalPlan): Option[(Expression, Expression, Literal)] = {
    def sides(diff: Expression, c: Expression): Option[(Expression, Expression, Literal)] =
      (diff, c) match {
        case (Abs(Subtract(a, b, _), _), lit @ Literal(v, t))
            if isIntegral(a) && isIntegral(b) && (t == LongType || t == IntegerType) &&
              v != null && v.toString.toLong > 0 =>
          if (a.references.subsetOf(left.outputSet) && b.references.subsetOf(right.outputSet))
            Some((a, b, lit))
          else if (b.references.subsetOf(left.outputSet) && a.references.subsetOf(right.outputSet))
            Some((b, a, lit))
          else None
        case _ => None
      }
    e match {
      case LessThanOrEqual(d, c)    => sides(d, c)
      case GreaterThanOrEqual(c, d) => sides(d, c)
      case _                        => None
    }
  }

  private def splitConjuncts(e: Expression): Seq[Expression] = e match {
    case And(a, b) => splitConjuncts(a) ++ splitConjuncts(b)
    case other     => Seq(other)
  }

  def apply(plan: LogicalPlan): LogicalPlan = plan.transform {
    case j @ Join(left, right, Inner, Some(cond), hint)
        if !cond.references.exists(_.name == LbName) &&
          j.resolved =>
      val conjuncts = splitConjuncts(cond)
      conjuncts.flatMap(c => bandPredicate(c, left, right)).headOption match {
        case Some((lt, rt, c)) =>
          val lb = bucket(lt, c)
          val probes = CreateArray(Seq(
            Subtract(lb, Literal(1L)),
            lb,
            Add(lb, Literal(1L))))
          val lbAttr = AttributeReference(LbName, LongType, nullable = true)()
          val gen = Generate(
            Explode(probes),
            unrequiredChildIndex = Nil,
            outer = false,
            qualifier = None,
            generatorOutput = Seq(lbAttr),
            child = left)
          val rbAlias = Alias(bucket(rt, c), RbName)()
          val projR   = Project(right.output :+ rbAlias, right)
          val newCond = And(cond, EqualTo(lbAttr, rbAlias.toAttribute))
          Project(j.output, Join(gen, projR, Inner, Some(newCond), hint))
        case None => j
      }
  }
}
