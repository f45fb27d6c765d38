package graft.plans

import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.plans.Inner
import org.apache.spark.sql.catalyst.plans.logical.{Generate, Join, LogicalPlan, Project}
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.types._

/** Optimizer rule: plan interval (range) joins as binned equi-joins.
  *
  * A user writing the natural
  *
  * {{{ points.join(intervals, $"p" >= $"s" && $"p" <= $"e") }}}
  *
  * hands Spark a join with no equi-condition, and Spark plans
  * BroadcastNestedLoopJoin — every point tested against every interval,
  * the one plan shape that cannot survive a 100× scale-up. This rule
  * recognizes the pattern at the logical level and rewrites it into the
  * [[graft.ops.RangeJoin]] shape automatically:
  *
  *  - the point side gains a bin column `p >> k` (arithmetic shift ==
  *    floor-division by the power-of-two bin width — exact for
  *    negatives, no division edge cases);
  *  - the interval side explodes `sequence(s >> k, e >> k)` — one row
  *    per covered bin, ≤ ceil(len/width)+1 rows per interval;
  *  - the join becomes an ordinary shuffled/broadcast EQUI-join on the
  *    bin key, with the ORIGINAL condition kept verbatim as the
  *    residual — bin equality is necessary for the bounds to hold, so
  *    the rewrite is row-for-row exact, and every downstream join
  *    machinery (AQE, skew splitting, broadcast thresholds) applies.
  *
  * The match is deliberately conservative:
  *  - INNER joins only, with BOTH a lower and an upper bound on the
  *    same expression (`>=`/`>` and `<=`/`<`, either operand order —
  *    SQL `BETWEEN` desugars to exactly this), the bounded expression
  *    referencing one side only and both bounds the other;
  *  - all three expressions deterministic and of integral type (epoch
  *    days, epoch seconds — any monotone integer axis);
  *  - joins that already carry a cross-side equality conjunct are left
  *    alone: they hash-join fine, and that guard also makes the rule
  *    idempotent (the rewritten join's bin equality is such a
  *    conjunct).
  *
  * Inverted intervals (`s > e`, matchable by nothing) generate one junk
  * bin row (`sequence` stop is clamped with `greatest`) that the
  * residual kills — never a crash, never a wrong row.
  *
  * Config: `spark.graft.rangeJoin.enabled` (default true) and
  * `spark.graft.rangeJoin.binWidth` (default 32; rounded up to a power
  * of two — the width only moves work between the explode fan-out and
  * per-bin pair testing, never correctness).
  *
  * Registered by [[graft.GraftExtensions]] alongside
  * [[FuseHofDotProduct]].
  */
object RewriteRangeJoin extends Rule[LogicalPlan] with PredicateHelper {

  val EnabledKey = "spark.graft.rangeJoin.enabled"
  val WidthKey = "spark.graft.rangeJoin.binWidth"
  val MaxBinsKey = "spark.graft.rangeJoin.maxBinsPerInterval"

  private def enabled: Boolean =
    conf.getConfString(EnabledKey, "true").toBoolean

  private def maxBins: Long =
    conf.getConfString(MaxBinsKey, "4096").toLong

  /** log2 of the bin width, width rounded UP to a power of two. */
  private def binShift: Int = {
    val w = conf.getConfString(WidthKey, "32").toLong
    require(w > 0, s"$WidthKey must be positive, got $w")
    64 - java.lang.Long.numberOfLeadingZeros(math.max(w - 1, 0))
  }

  private def integral(e: Expression): Boolean = e.dataType match {
    case ByteType | ShortType | IntegerType | LongType => true
    case _ => false
  }

  /** `(bounded, bound)` if `c` bounds some expression from below. */
  private def lowerBound(c: Expression): Option[(Expression, Expression)] =
    c match {
      case GreaterThanOrEqual(p, s) => Some((p, s))
      case GreaterThan(p, s)        => Some((p, s))
      case LessThanOrEqual(s, p)    => Some((p, s))
      case LessThan(s, p)           => Some((p, s))
      case _                        => None
    }

  /** `(bounded, bound)` if `c` bounds some expression from above. */
  private def upperBound(c: Expression): Option[(Expression, Expression)] =
    c match {
      case LessThanOrEqual(p, e)    => Some((p, e))
      case LessThan(p, e)           => Some((p, e))
      case GreaterThanOrEqual(e, p) => Some((p, e))
      case GreaterThan(e, p)        => Some((p, e))
      case _                        => None
    }

  override def apply(plan: LogicalPlan): LogicalPlan = {
    if (!enabled) return plan
    plan.transform {
      case j @ Join(_, _, Inner, Some(cond), _) =>
        rewrite(j, cond).getOrElse(j)
    }
  }

  private def rewrite(j: Join, cond: Expression): Option[LogicalPlan] = {
    val conjuncts = splitConjunctivePredicates(cond)
    val leftOut = j.left.outputSet
    val rightOut = j.right.outputSet
    def fromLeft(e: Expression) =
      e.references.nonEmpty && e.references.subsetOf(leftOut)
    def fromRight(e: Expression) =
      e.references.nonEmpty && e.references.subsetOf(rightOut)
    def crossSideEquality(c: Expression) = c match {
      case EqualTo(a, b) =>
        (fromLeft(a) && fromRight(b)) || (fromLeft(b) && fromRight(a))
      case EqualNullSafe(a, b) =>
        (fromLeft(a) && fromRight(b)) || (fromLeft(b) && fromRight(a))
      case _ => false
    }
    if (conjuncts.exists(crossSideEquality)) return None

    val candidates = for {
      (p1, lo) <- conjuncts.flatMap(lowerBound)
      (p2, hi) <- conjuncts.flatMap(upperBound)
      if p1.semanticEquals(p2)
      if Seq(p1, lo, hi).forall(e => e.deterministic && integral(e))
      pointsOnLeft <-
        if (fromLeft(p1) && fromRight(lo) && fromRight(hi)) Some(true)
        else if (fromRight(p1) && fromLeft(lo) && fromLeft(hi)) Some(false)
        else None
    } yield (p1, lo, hi, pointsOnLeft)

    candidates.headOption.map { case (p, lo, hi, pointsOnLeft) =>
      val k = Literal(binShift, IntegerType)
      val tz = Some(conf.sessionLocalTimeZone)
      def bin(e: Expression): Expression = {
        val x = if (e.dataType == LongType) e else Cast(e, LongType, tz)
        ShiftRight(x, k)
      }
      val (pointsSide, intervalsSide) =
        if (pointsOnLeft) (j.left, j.right) else (j.right, j.left)

      val binAlias = Alias(bin(p), "__graft_bin_p")()
      val pointsProj =
        Project(pointsSide.output :+ binAlias, pointsSide)

      val startBin = bin(lo)
      val endBin = bin(hi)
      // fan-out guard: an interval spanning millions of bins (binWidth
      // far smaller than the interval length — e.g. the default width
      // on an epoch-millis axis with day-long intervals) would explode
      // the Generate or overflow Sequence's array limit. Fail with an
      // actionable message instead of an OOM/cryptic error; the user
      // raises the width (best), raises the cap, or disables the rule.
      val guardMsg = Literal(
        s"graft range-join rewrite: an interval spans more than " +
          s"$maxBins bins at the configured $WidthKey — raise $WidthKey " +
          s"toward the typical interval length, raise $MaxBinsKey, or " +
          s"disable $EnabledKey")
      val guardedStop = If(
        GreaterThan(Subtract(endBin, startBin), Literal(maxBins, LongType)),
        Cast(RaiseError(guardMsg), LongType, tz),
        Greatest(Seq(startBin, endBin)))
      // Sequence is TimeZoneAwareExpression: without an explicit zone it
      // stays unresolved and the optimizer rejects the rewritten plan
      val seq = Sequence(
        startBin,
        guardedStop,
        Some(Literal(1L, LongType)),
        tz)
      val binAttr = AttributeReference("__graft_bin_i", LongType,
        nullable = false)()
      val intervalsGen = Generate(Explode(seq),
        unrequiredChildIndex = Nil, outer = false, qualifier = None,
        generatorOutput = Seq(binAttr), child = intervalsSide)

      val newCond = And(EqualTo(binAlias.toAttribute, binAttr), cond)
      val (newLeft, newRight) =
        if (pointsOnLeft) (pointsProj, intervalsGen)
        else (intervalsGen, pointsProj)
      Project(j.output, Join(newLeft, newRight, Inner, Some(newCond), j.hint))
    }
  }
}
