package graft.plans

import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.plans.Inner
import org.apache.spark.sql.catalyst.plans.logical._
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.internal.SQLConf
import org.apache.spark.sql.types.{IntegerType, LongType}

/** Optimizer rule: turn a naive interval-overlap theta-join
  * (`aStart <= bEnd AND bStart <= aEnd`) into the bucketed equi join.
  *
  * Without an equi key, OSS Catalyst plans the overlap join as
  * BroadcastNestedLoopJoin or CartesianProduct.  This rule replicates each
  * side's interval across the fixed-width buckets it spans
  * (`Generate(Explode(Sequence(...)))`), joins on bucket equality, and
  * keeps a pair only in its OVERLAP-START bucket
  * (`bucket == floor(max(aStart, bStart) / w)`) — exactly-once without a
  * distinct, the planner-integrated version of
  * [[graft.joins.NonEquiJoins.intervalOverlapJoinVar]].
  *
  * Correctness does not depend on which crossing inequality pair is
  * matched: for ANY expressions with `x1 <= y2` and `x2 <= y1` (x from one
  * side, y from the other), `m = max(x1, x2)` is either an endpoint of, or
  * bounded inside, each side's value range, so `floor(m/w)` lies in both
  * generated bucket sets (the two-argument Sequence yields the same bucket
  * SET for descending "intervals").  Matching a different conjunct pair
  * can only change replication cost, never results.
  *
  * The bucket width is data-dependent (an interval spans len/w + 1
  * buckets), so the rule only fires when the session sets
  * `graft.interval.rewrite.bucketWidth` to a positive long — the same
  * posture as AQE's size thresholds.  Integral (int/long) bound
  * expressions only; NULL bounds generate no buckets, matching the naive
  * join's NULL-comparison semantics.
  */
object IntervalOverlapAutoRewrite extends Rule[LogicalPlan] with PredicateHelper {

  val WidthConf = "graft.interval.rewrite.bucketWidth"

  private def fd(e: Expression, w: Long): Expression = {
    val l = Cast(e, LongType)
    Subtract(
      IntegralDivide(l, Literal(w)),
      If(LessThan(Remainder(l, Literal(w)), Literal(0L)), Literal(1L), Literal(0L)))
  }

  private case class Overlap(aStart: Expression, aEnd: Expression,
      bStart: Expression, bEnd: Expression)

  private def findOverlap(cond: Expression, left: LogicalPlan, right: LogicalPlan)
      : Option[Overlap] = {
    def sideOf(e: Expression): Option[Boolean] = {
      val refs = e.references
      if (refs.isEmpty) None
      else if (refs.subsetOf(left.outputSet)) Some(true)
      else if (refs.subsetOf(right.outputSet)) Some(false)
      else None
    }
    def integral(e: Expression): Boolean = e.dataType match {
      case LongType | IntegerType => true
      case _ => false
    }
    val ineqs = splitConjunctivePredicates(cond).collect {
      case LessThanOrEqual(a, b) => (a, b)
      case LessThan(a, b) => (a, b)
      case GreaterThanOrEqual(a, b) => (b, a)
      case GreaterThan(a, b) => (b, a)
    }.filter { case (lo, hi) => integral(lo) && integral(hi) }
    val lr = ineqs.find { case (lo, hi) =>
      sideOf(lo).contains(true) && sideOf(hi).contains(false)
    }
    val rl = ineqs.find { case (lo, hi) =>
      sideOf(lo).contains(false) && sideOf(hi).contains(true)
    }
    (lr, rl) match {
      case (Some((aStart, bEnd)), Some((bStart, aEnd))) =>
        Some(Overlap(aStart, aEnd, bStart, bEnd))
      case _ => None
    }
  }

  private def hasEquiKey(cond: Expression, left: LogicalPlan, right: LogicalPlan): Boolean =
    splitConjunctivePredicates(cond).exists {
      case EqualTo(a, b) =>
        (a.references.subsetOf(left.outputSet) && b.references.subsetOf(right.outputSet)) ||
          (a.references.subsetOf(right.outputSet) && b.references.subsetOf(left.outputSet))
      case _ => false
    }

  override def apply(plan: LogicalPlan): LogicalPlan = {
    val w = SQLConf.get.getConfString(WidthConf, "0").toLong
    if (w <= 0) plan
    else plan.transform {
      case j @ Join(left, right, Inner, Some(cond), hint)
          if !hasEquiKey(cond, left, right) =>
        findOverlap(cond, left, right) match {
          case Some(o) =>
            val gbL = AttributeReference("__graft_ivl", LongType)()
            val gbR = AttributeReference("__graft_ivr", LongType)()
            // Sequence is TimeZoneAwareExpression — an unset zone leaves the
            // rewritten plan unresolved even for integral bounds
            val tz = Some(SQLConf.get.sessionLocalTimeZone)
            val leftGen = Generate(
              Explode(Sequence(fd(o.aStart, w), fd(o.aEnd, w), None, tz)),
              unrequiredChildIndex = Nil, outer = false, qualifier = None,
              generatorOutput = Seq(gbL), child = left)
            val rightGen = Generate(
              Explode(Sequence(fd(o.bStart, w), fd(o.bEnd, w), None, tz)),
              unrequiredChildIndex = Nil, outer = false, qualifier = None,
              generatorOutput = Seq(gbR), child = right)
            val startBucket = fd(Greatest(Seq(o.aStart, o.bStart)), w)
            val newJoin = Join(leftGen, rightGen, Inner,
              Some(And(And(EqualTo(gbL, gbR), EqualTo(gbL, startBucket)), cond)), hint)
            Project(j.output, newJoin)
          case None => j
        }
    }
  }
}
