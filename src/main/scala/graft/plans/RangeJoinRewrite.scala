package graft.plans

import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.plans.Inner
import org.apache.spark.sql.catalyst.plans.logical._
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.types.{DoubleType, LongType, NumericType, TimestampType}

/** Optimizer rule: rewrite interval-containment joins into bucketed
  * equi-joins.
  *
  * Spark plans an inner join whose condition is `lo <= p AND p <= hi`
  * (no equi key; any further non-equi conjuncts ride along) as a
  * broadcast-nested-loop — O(|points|·|intervals|) comparisons, the
  * classic range-join scale cliff. Timestamp ranges qualify too
  * (bucketed via their epoch-seconds cast; `bucketSize` is then seconds). The DataFrame-level
  * escape hatch is `graft.ops.Joins.rangeJoin`; this rule applies the SAME
  * bucket-explosion rewrite transparently to any matching logical join, so
  * `points.join(intervals, $"p" between ($"lo", $"hi"))` — or the
  * equivalent SQL — gets the scalable plan without the caller knowing the
  * trick:
  *
  *   points  -> filter(p not null)           + bucket  = floor(p  / size)
  *   ranges  -> filter(lo/hi not null, lo<=hi) + explode(floor(lo/size) .. floor(hi/size))
  *   join on bucket equality AND the original predicate (exact re-check)
  *
  * Row-identical to the nested loop: every qualifying pair shares the
  * point's bucket (the interval covers it), non-qualifying bucket
  * collisions are removed by re-applying the original condition, and each
  * (point, interval) candidate arises at most once (a point has exactly
  * one bucket). Strict bounds (`<`) are accepted — buckets are computed
  * from the inclusive hull, a superset, and exactness is restored by the
  * re-check. Caveat: non-finite bounds (NaN/±Inf) are not bucketable and
  * such rows may be dropped — finite numerics only, the rule's documented
  * domain.
  *
  * OPT-IN: fires only when `spark.graft.rangeJoin.bucketSize` is set
  * positive (bucket width in the join column's units — pick it near the
  * median interval span; replication per interval is span/size + 1).
  * Registered either via `spark.sql.extensions=graft.plans.GraftSparkExtensions`
  * or at runtime through `spark.experimental.extraOptimizations`. The rule
  * never fires on joins that already have an equi key (hash join handles
  * those) — which also makes it a no-op on its own output.
  */
object RangeJoinRewrite extends Rule[LogicalPlan] with PredicateHelper {

  val BucketSizeKey = "spark.graft.rangeJoin.bucketSize"

  override def apply(plan: LogicalPlan): LogicalPlan = {
    val size = conf.getConfString(BucketSizeKey, "0").toDouble
    if (size <= 0) plan
    else plan.transformUp {
      case j @ Join(_, _, Inner, Some(cond), _)
          if j.resolved && cond.deterministic && !hasEquiKey(j) =>
        rewrite(j, size).getOrElse(j)
    }
  }

  /** One conjunct `a (<|<=) b`, normalized so `small <= large`. */
  private def asBound(e: Expression): Option[(Expression, Expression)] = e match {
    case LessThanOrEqual(a, b) => Some((a, b))
    case LessThan(a, b)        => Some((a, b))
    case GreaterThanOrEqual(a, b) => Some((b, a))
    case GreaterThan(a, b)        => Some((b, a))
    case _ => None
  }

  private def hasEquiKey(j: Join): Boolean =
    splitConjunctivePredicates(j.condition.get).exists {
      case EqualTo(a, b) => straddles(a, b, j)
      case EqualNullSafe(a, b) => straddles(a, b, j)
      case _ => false
    }

  private def straddles(a: Expression, b: Expression, j: Join): Boolean =
    (a.references.subsetOf(j.left.outputSet) && b.references.subsetOf(j.right.outputSet)) ||
      (a.references.subsetOf(j.right.outputSet) && b.references.subsetOf(j.left.outputSet))

  /** Find ANY sandwich pair (lo ≤ p, p ≤ hi) among the conjuncts; the rest
    * of the condition rides along into the rewritten join unchanged (it is
    * re-applied on the bucket-join output, same as the range predicate).
    */
  private def rewrite(j: Join, size: Double): Option[LogicalPlan] = {
    val conjuncts = splitConjunctivePredicates(j.condition.get)
    val bounds = conjuncts.flatMap(asBound)
    val sandwiches = for {
      (lo, p1) <- bounds
      (p2, hi) <- bounds
      if p1.semanticEquals(p2) && !(lo.semanticEquals(p2) && p1.semanticEquals(hi))
    } yield (p1, lo, hi)
    sandwiches.view.flatMap { case (p, lo, hi) => build(j, p, lo, hi, size) }.headOption
  }

  private def build(
      j: Join, p: Expression, lo: Expression, hi: Expression, size: Double): Option[LogicalPlan] = {
    def from(side: LogicalPlan)(e: Expression): Boolean =
      e.references.nonEmpty && e.references.subsetOf(side.outputSet)
    // timestamps bucket via their epoch-seconds double cast (validity
    // intervals and event-time ranges are the common case at scale)
    def bucketable(e: Expression): Boolean =
      e.dataType.isInstanceOf[NumericType] || e.dataType.isInstanceOf[TimestampType]
    if (!Seq(p, lo, hi).forall(bucketable)) return None

    // point on the left and bounds on the right, or the mirror image
    val oriented: Option[(LogicalPlan, LogicalPlan, Boolean)] =
      if (from(j.left)(p) && from(j.right)(lo) && from(j.right)(hi))
        Some((j.left, j.right, true))
      else if (from(j.right)(p) && from(j.left)(lo) && from(j.left)(hi))
        Some((j.left, j.right, false))
      else None

    oriented.map { case (left, right, pointOnLeft) =>
      def bucket(e: Expression): Expression =
        Floor(Divide(Cast(e, DoubleType), Literal(size)))
      val pointSide = {
        val base = if (pointOnLeft) left else right
        val filtered = if (p.nullable) Filter(IsNotNull(p), base) else base
        val a = Alias(bucket(p), "__rj_bucket_p")()
        (Project(base.output :+ a, filtered), a.toAttribute)
      }
      val intervalSide = {
        val base = if (pointOnLeft) right else left
        val guard = And(And(IsNotNull(lo), IsNotNull(hi)), LessThanOrEqual(lo, hi))
        // Sequence is TimeZoneAwareExpression: the analyzer's ResolveTimeZone
        // has already run, so the timezone must be supplied here or the plan
        // becomes unresolved mid-optimization
        val gen = Explode(Sequence(bucket(lo), bucket(hi), Some(Literal(1L)))
          .withTimeZone(conf.sessionLocalTimeZone))
        val out = AttributeReference("__rj_bucket_i", LongType, nullable = false)()
        (Generate(gen, unrequiredChildIndex = Nil, outer = false, qualifier = None,
          generatorOutput = Seq(out), child = Filter(guard, base)), out)
      }
      val (pPlan, pAttr) = pointSide
      val (iPlan, iAttr) = intervalSide
      val (newLeft, newRight) =
        if (pointOnLeft) (pPlan, iPlan) else (iPlan, pPlan)
      val newCond = And(EqualTo(pAttr, iAttr), j.condition.get)
      Project(j.output, Join(newLeft, newRight, Inner, Some(newCond), j.hint))
    }
  }
}

/** `spark.sql.extensions` entry point registering the graft optimizer
  * rules on session build.
  */
class GraftSparkExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(ext: SparkSessionExtensions): Unit = {
    ext.injectOptimizerRule(_ => RangeJoinRewrite)
  }
}
