package graft.plans

import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.plans.Inner
import org.apache.spark.sql.catalyst.plans.logical._
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.types.{DayTimeIntervalType, LongType, TimestampType}
import org.apache.spark.unsafe.types.CalendarInterval

/** Optimizer rule: rewrite bounded-interval joins into bucketed equi-joins.
  *
  * Pattern (the shape of Q11, and of any event-correlation query):
  * {{{
  *   L JOIN R ON [optional equi conjuncts AND]
  *               R.t > L.t  AND  R.t <= L.t + INTERVAL w     -- or >=, <
  * }}}
  *
  * Without this rule the range predicates contribute nothing to the join
  * key: Spark hash-joins on the equi conjuncts alone (fan-in =
  * rows-per-key², catastrophic for hot keys) or nested-loops when no
  * equi key exists (O(|L|·|R|)). The rewrite adds a time-bucket key of
  * width w: the left row is exploded to its bucket and the next one, the
  * right row computes its own bucket, and `jb = bucket(R.t)` joins them —
  * every true match satisfies bucket(R.t) ∈ {bucket(L.t), bucket(L.t)+1}
  * when 0 < R.t - L.t <= w. Fan-in drops to rows-per-(key, w-window),
  * which is what survives a dense 100 TB event log.
  *
  * This is the (c)-level custom Catalyst surface SURVEY §4 reserved for
  * exactly this operator; everything else rides on stock rules. Inject
  * with `SparkSession.builder().withExtensions(new GraftExtensions)`.
  */
object BucketedIntervalJoin extends Rule[LogicalPlan] {

  private val BucketCol = "_graft_jb"

  override def apply(plan: LogicalPlan): LogicalPlan = plan.transform {
    case j @ Join(left, right, Inner, Some(cond), hint)
        if !cond.references.exists(_.name == BucketCol) =>
      rewrite(j, left, right, cond, hint).getOrElse(j)
  }

  /** A lower-bound conjunct `earlier < later`; the earlier timestamp may
    * sit on EITHER join side (the mirrored query is just as common).
    */
  private final case class Bound(earlier: Expression, later: Expression,
      earlierOnLeft: Boolean)

  private def rewrite(j: Join, left: LogicalPlan, right: LogicalPlan,
      cond: Expression, hint: JoinHint): Option[LogicalPlan] = {
    val conjuncts = splitConjuncts(cond)

    // ALL strict/inclusive lower bounds, both spellings and orientations.
    val lowers: Seq[Bound] = conjuncts.collect {
      case GreaterThan(a, b) => (b, a)
      case GreaterThanOrEqual(a, b) => (b, a)
      case LessThan(b, a) => (b, a)
      case LessThanOrEqual(b, a) => (b, a)
    }.flatMap { case (e, l) =>
      if (sides(e, l, left, right)) Some(Bound(e, l, earlierOnLeft = true))
      else if (sides(e, l, right, left)) Some(Bound(e, l, earlierOnLeft = false))
      else None
    }

    // The first candidate that ALSO carries a width conjunct wins —
    // committing to the first timestamp comparison alone (collectFirst)
    // would silently abandon the rewrite whenever an unrelated
    // comparison (e.g. a created_at guard) happened to appear first.
    lowers.view.flatMap { b =>
      // An upper bound later {<, <=} earlier + INTERVAL w on the SAME pair.
      val width = conjuncts.collectFirst {
        case LessThanOrEqual(l2, AddLike(e2, w))
            if l2.semanticEquals(b.later) && e2.semanticEquals(b.earlier) => w
        case LessThan(l2, AddLike(e2, w))
            if l2.semanticEquals(b.later) && e2.semanticEquals(b.earlier) => w
        case GreaterThanOrEqual(AddLike(e2, w), l2)
            if l2.semanticEquals(b.later) && e2.semanticEquals(b.earlier) => w
        case GreaterThan(AddLike(e2, w), l2)
            if l2.semanticEquals(b.later) && e2.semanticEquals(b.earlier) => w
      }
      width.map { wMicros =>
        val bE = bucket(b.earlier, wMicros)
        val jb = AttributeReference(BucketCol, LongType, nullable = true)()
        val gen = Generate(
          Explode(CreateArray(Seq(bE, Add(bE, Literal(1L))))),
          unrequiredChildIndex = Nil, outer = false, qualifier = None,
          generatorOutput = Seq(jb),
          child = if (b.earlierOnLeft) left else right)
        val newCond = And(cond, EqualTo(jb, bucket(b.later, wMicros)))
        val newJoin =
          if (b.earlierOnLeft) Join(gen, right, Inner, Some(newCond), hint)
          else Join(left, gen, Inner, Some(newCond), hint)
        Project(j.output, newJoin)
      }
    }.headOption
  }

  /** trunc-div time bucket — the two-bucket covering invariant holds for
    * truncating division as well as floor (bucket() is monotone and a
    * span of w crosses at most one boundary).
    */
  private def bucket(t: Expression, wMicros: Long): Expression =
    IntegralDivide(UnixMicros(t), Literal(wMicros))

  private def sides(lt: Expression, rt: Expression,
      left: LogicalPlan, right: LogicalPlan): Boolean =
    lt.dataType == TimestampType && rt.dataType == TimestampType &&
      lt.references.nonEmpty && rt.references.nonEmpty &&
      lt.references.subsetOf(left.outputSet) &&
      rt.references.subsetOf(right.outputSet)

  private def splitConjuncts(e: Expression): Seq[Expression] = e match {
    case And(a, b) => splitConjuncts(a) ++ splitConjuncts(b)
    case other => Seq(other)
  }

  /** Matches `t + INTERVAL w` however Catalyst spelled it (TimeAdd or a
    * raw Add), yielding the fixed width in microseconds. Calendar-varying
    * intervals (months / days components) are not rewritten.
    *
    * ONLY additive nodes match: accepting any BinaryExpression with a
    * (timestamp, positive-interval) operand shape would capture
    * non-additive arithmetic and rewrite to wrong buckets — today stock
    * Spark folds `t - itvl` into an additive node with a NEGATIVE
    * literal (rejected by `micros > 0`), but that guard is accidental,
    * not structural.
    */
  private object AddLike {
    def unapply(e: Expression): Option[(Expression, Long)] = e match {
      case c: Cast if c.dataType == TimestampType => unapply(c.child)
      case b @ (_: TimestampAddInterval | _: Add) =>
        val be = b.asInstanceOf[BinaryExpression]
        (be.left, be.right) match {
          // ANSI interval literal: value IS the width in microseconds.
          case (t, Literal(micros: Long, _: DayTimeIntervalType))
              if t.dataType == TimestampType && micros > 0 =>
            Some((t, micros))
          // Legacy calendar interval: only fixed-duration ones rewrite.
          case (t, Literal(i: CalendarInterval, _))
              if t.dataType == TimestampType && i.months == 0 && i.days == 0 &&
                i.microseconds > 0 =>
            Some((t, i.microseconds))
          case _ => None
        }
      case _ => None
    }
  }
}
