package graft.plans

import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.plans.Inner
import org.apache.spark.sql.catalyst.plans.logical._
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.types.{DoubleType, LongType}

/** Optimizer rule: turn a naive band theta-join into the bucketed equi join.
  *
  * OSS Catalyst plans an inner join whose only condition is
  * `abs(l - r) <= eps` as BroadcastNestedLoopJoin (small side) or
  * CartesianProduct (otherwise) — both fatal at 100 TB.  This rule detects
  * the band conjunct, synthesizes an `eps`-wide bucket id on each side
  * (left side replicated to bucket-1/bucket/bucket+1 via Generate+Explode),
  * and rewrites the join into an equi join on the bucket plus the original
  * predicate.  Result sets are identical: every qualifying pair meets in
  * exactly the right row's bucket, and the exact predicate is re-checked.
  *
  * This is the planner-integrated version of
  * [[graft.joins.NonEquiJoins.bandJoin]]: with the rule installed, a user
  * writing the naive `a.join(b, abs(a("v") - b("v")) <= 0.5)` gets the
  * scalable plan with no API change.  Install per session via
  * `spark.experimental.extraOptimizations :+= BandJoinAutoRewrite`, or for
  * every session with
  * `--conf spark.sql.extensions=graft.plans.GraftExtensions`.
  */
object BandJoinAutoRewrite extends Rule[LogicalPlan] with PredicateHelper {

  /** (leftValue, rightValue, eps) for the first rewritable band conjunct. */
  private def findBand(cond: Expression, left: LogicalPlan, right: LogicalPlan)
      : Option[(Expression, Expression, Double)] = {
    def sideOf(e: Expression): Option[Boolean] = {
      val refs = e.references
      if (refs.isEmpty) None
      else if (refs.subsetOf(left.outputSet)) Some(true)
      else if (refs.subsetOf(right.outputSet)) Some(false)
      else None
    }
    splitConjunctivePredicates(cond).iterator.map {
      case LessThanOrEqual(Abs(Subtract(x, y, _), _), Literal(eps: Double, DoubleType)) => (x, y, eps)
      case LessThan(Abs(Subtract(x, y, _), _), Literal(eps: Double, DoubleType)) => (x, y, eps)
      case GreaterThanOrEqual(Literal(eps: Double, DoubleType), Abs(Subtract(x, y, _), _)) => (x, y, eps)
      case _ => null
    }.collect {
      case (x, y, eps) if eps > 0 && x.dataType == DoubleType && y.dataType == DoubleType =>
        (sideOf(x), sideOf(y)) match {
          case (Some(true), Some(false)) => Some((x, y, eps))
          case (Some(false), Some(true)) => Some((y, x, eps))
          case _ => None
        }
    }.flatten.nextOption()
  }

  /** True if the join already has a usable equi conjunct (Catalyst will pick
    * a hash/sort-merge join by itself — no rewrite needed). */
  private def hasEquiKey(cond: Expression, left: LogicalPlan, right: LogicalPlan): Boolean =
    splitConjunctivePredicates(cond).exists {
      case EqualTo(a, b) =>
        (a.references.subsetOf(left.outputSet) && b.references.subsetOf(right.outputSet)) ||
          (a.references.subsetOf(right.outputSet) && b.references.subsetOf(left.outputSet))
      case _ => false
    }

  override def apply(plan: LogicalPlan): LogicalPlan = plan.transform {
    case j @ Join(left, right, Inner, Some(cond), hint)
        if !hasEquiKey(cond, left, right) =>
      findBand(cond, left, right) match {
        case Some((lVal, rVal, eps)) =>
          val bL = Floor(Divide(lVal, Literal(eps)))
          val gb = AttributeReference("__graft_gb", LongType)()
          val buckets = CreateArray(Seq(
            Subtract(bL, Literal(1L)), bL, Add(bL, Literal(1L))))
          val leftGen = Generate(Explode(buckets),
            unrequiredChildIndex = Nil, outer = false, qualifier = None,
            generatorOutput = Seq(gb), child = left)
          val gbr = Alias(Floor(Divide(rVal, Literal(eps))), "__graft_gbr")()
          val rightProj = Project(right.output :+ gbr, right)
          val newJoin = Join(leftGen, rightProj, Inner,
            Some(And(EqualTo(gb, gbr.toAttribute), cond)), hint)
          Project(j.output, newJoin)
        case None => j
      }
  }
}

/** `spark.sql.extensions=graft.plans.GraftExtensions` installs the graft
  * planner extensions into every new SparkSession. */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(e: SparkSessionExtensions): Unit = {
    e.injectOptimizerRule(_ => BandJoinAutoRewrite)
    e.injectPlannerStrategy(_ => TopKStrategy)
  }
}
