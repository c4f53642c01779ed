package graft.plans

import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.plans.Inner
import org.apache.spark.sql.catalyst.plans.logical._
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.types.{DoubleType, IntegerType, LongType}

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

  /** Bucket id for a DOUBLE band value: floor(v / eps) (LongType out). */
  private def doubleBucket(eps: Double)(v: Expression): Expression =
    Floor(Divide(v, Literal(eps)))

  /** Bucket id for an INTEGRAL band value: exact `Math.floorDiv(v, eps)` as
    * expressions — truncating `div` corrected by 1 when the remainder is
    * negative.  Overflow-free over the whole long range, where a double
    * quotient would mis-bucket values above 2^53 (epoch-micros timestamps
    * are already past 2^50). */
  private def integralBucket(eps: Long)(v: Expression): Expression = {
    val l = Cast(v, LongType)
    Subtract(
      IntegralDivide(l, Literal(eps)),
      If(LessThan(Remainder(l, Literal(eps)), Literal(0L)), Literal(1L), Literal(0L)))
  }

  /** (leftValue, rightValue, bucketizer) for the first rewritable band
    * conjunct: `abs(l - r) <= eps` (or `<`, or flipped `>=`) with both
    * values double, or both integral with an integral eps literal.  Type
    * coercion has already run, so mixed int/long sides appear as casts to a
    * common integral type and int literals against long values are already
    * long — matching the coerced literal type is the general case. */
  private def findBand(cond: Expression, left: LogicalPlan, right: LogicalPlan)
      : Option[(Expression, Expression, Expression => Expression)] = {
    def sideOf(e: Expression): Option[Boolean] = {
      val refs = e.references
      if (refs.isEmpty) None
      else if (refs.subsetOf(left.outputSet)) Some(true)
      else if (refs.subsetOf(right.outputSet)) Some(false)
      else None
    }
    def bucketizer(valType: org.apache.spark.sql.types.DataType, eps: Literal)
        : Option[Expression => Expression] = (valType, eps) match {
      case (DoubleType, Literal(e: Double, DoubleType)) if e > 0 => Some(doubleBucket(e))
      case (LongType | IntegerType, Literal(e: Long, LongType)) if e > 0 => Some(integralBucket(e))
      case (LongType | IntegerType, Literal(e: Int, IntegerType)) if e > 0 => Some(integralBucket(e.toLong))
      case _ => None
    }
    splitConjunctivePredicates(cond).iterator.map {
      case LessThanOrEqual(Abs(Subtract(x, y, _), _), l: Literal) => (x, y, l)
      case LessThan(Abs(Subtract(x, y, _), _), l: Literal) => (x, y, l)
      case GreaterThanOrEqual(l: Literal, Abs(Subtract(x, y, _), _)) => (x, y, l)
      case _ => null
    }.collect {
      case (x, y, epsLit) if x != null && x.dataType == y.dataType =>
        bucketizer(x.dataType, epsLit).flatMap { mk =>
          (sideOf(x), sideOf(y)) match {
            case (Some(true), Some(false)) => Some((x, y, mk))
            case (Some(false), Some(true)) => Some((y, x, mk))
            case _ => None
          }
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
        case Some((lVal, rVal, mkBucket)) =>
          val bL = mkBucket(lVal)
          val gb = AttributeReference("__graft_gb", LongType)()
          val buckets = CreateArray(Seq(
            Subtract(bL, Literal(1L)), bL, Add(bL, Literal(1L))))
          val leftGen = Generate(Explode(buckets),
            unrequiredChildIndex = Nil, outer = false, qualifier = None,
            generatorOutput = Seq(gb), child = left)
          val gbr = Alias(mkBucket(rVal), "__graft_gbr")()
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
    e.injectOptimizerRule(_ => IntervalOverlapAutoRewrite)
    e.injectPlannerStrategy(_ => TopKStrategy)
    e.injectPlannerStrategy(_ => IEJoinStrategy)
  }
}
