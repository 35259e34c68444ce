package graft.plans

import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.types.{LongType, TimestampType}

/** Restores parquet filter pushdown across the nanos→timestamp
  * conversion.
  *
  * The driver's `events.ts` is TIMESTAMP(NANOS), which Spark reads as a
  * nanos LONG (`spark.sql.legacy.parquet.nanosAsLong=true`); query code
  * converts it with `timestamp_micros(ts DIV 1000)`. A time-range
  * filter then compares the CONVERTED column, which Catalyst cannot
  * invert, so the predicate stays above the scan and every row is read
  * (PLANS.md documented this boundary). This rule rewrites
  *
  *   timestamp_micros(raw DIV 1000)  {>=,>,<=,<,=}  TIMESTAMP literal
  *
  * into a comparison on the RAW nanos column, which the parquet source
  * pushes into row-group min/max skipping.
  *
  * Soundness (`DIV` truncates toward zero, so the naive inversion is
  * wrong around 0 and for negative values — guarded per operator, with
  * m = the literal's micros value and a = the raw nanos):
  *
  *  - a DIV 1000 >= m  ⟺  a >= 1000m          for m >= 1
  *  - a DIV 1000 >  m  ⟺  a >  1000m + 999    for m >= 0
  *  - a DIV 1000 <= m  ⟺  a <= 1000m + 999    for m >= 0
  *  - a DIV 1000 <  m  ⟺  a <  1000m          for m >= 1
  *  - a DIV 1000 =  m  ⟺  1000m <= a <= 1000m+999  for m >= 1
  *
  * (for m >= 1, any negative a truncates to <= 0 on the left and fails
  * the right side too; for the m >= 0 upper-bound forms, negative a
  * satisfies both sides). Literals outside the guard, or whose nanos
  * would overflow Long (year ≳ 2262 — exactly the values a NANOS
  * column cannot hold anyway), are left untouched. Registered via
  * [[GraftExtensions]] (`spark.sql.extensions=graft.plans.GraftExtensions`).
  */
object NanoTsPushdown extends Rule[LogicalPlan] {

  /** Matches timestamp_micros(child DIV 1000) and yields the raw child. */
  private object NanosConv {
    def unapply(e: Expression): Option[Expression] = e match {
      case MicrosToTimestamp(d: IntegralDivide)
          if d.right.foldable && d.left.dataType == LongType &&
            (d.right.eval() match {
              case 1000L => true
              case 1000 => true
              case _ => false
            }) =>
        Some(d.left)
      case _ => None
    }
  }

  /** Timestamp literal's micros value. */
  private object TsLit {
    def unapply(e: Expression): Option[Long] = e match {
      case Literal(m: Long, TimestampType) => Some(m)
      case Cast(Literal(m: Long, TimestampType), TimestampType, _, _) => Some(m)
      case _ => None
    }
  }

  /** m·1000 as nanos, None on overflow. */
  private def nanos(m: Long): Option[Long] =
    if (m <= Long.MaxValue / 1000 && m >= Long.MinValue / 1000) Some(m * 1000L) else None

  /** m·1000 + 999 (the last nano that truncates to m), None on
    * overflow — the upper-bound forms need the extra headroom: for
    * m = Long.MaxValue/1000 (the max-nanos sentinel timestamp
    * 2262-04-11T23:47:16.854775Z) m·1000 fits but m·1000+999 wraps,
    * which would silently flip the predicate.
    */
  private def nanosUp(m: Long): Option[Long] =
    if (m <= (Long.MaxValue - 999L) / 1000 && m >= Long.MinValue / 1000)
      Some(m * 1000L + 999L)
    else None

  override def apply(plan: LogicalPlan): LogicalPlan = plan.transformAllExpressions {
    // literal on the right
    case GreaterThanOrEqual(NanosConv(a), TsLit(m)) if m >= 1 && nanos(m).isDefined =>
      GreaterThanOrEqual(a, Literal(nanos(m).get, LongType))
    case GreaterThan(NanosConv(a), TsLit(m)) if m >= 0 && nanosUp(m).isDefined =>
      GreaterThan(a, Literal(nanosUp(m).get, LongType))
    case LessThanOrEqual(NanosConv(a), TsLit(m)) if m >= 0 && nanosUp(m).isDefined =>
      LessThanOrEqual(a, Literal(nanosUp(m).get, LongType))
    case LessThan(NanosConv(a), TsLit(m)) if m >= 1 && nanos(m).isDefined =>
      LessThan(a, Literal(nanos(m).get, LongType))
    case EqualTo(NanosConv(a), TsLit(m)) if m >= 1 && nanosUp(m).isDefined =>
      And(GreaterThanOrEqual(a, Literal(nanos(m).get, LongType)),
        LessThanOrEqual(a, Literal(nanosUp(m).get, LongType)))
    // literal on the left (mirrored operators)
    case GreaterThanOrEqual(TsLit(m), NanosConv(a)) if m >= 0 && nanosUp(m).isDefined =>
      GreaterThanOrEqual(Literal(nanosUp(m).get, LongType), a)
    case GreaterThan(TsLit(m), NanosConv(a)) if m >= 1 && nanos(m).isDefined =>
      GreaterThan(Literal(nanos(m).get, LongType), a)
    case LessThanOrEqual(TsLit(m), NanosConv(a)) if m >= 1 && nanos(m).isDefined =>
      LessThanOrEqual(Literal(nanos(m).get, LongType), a)
    case LessThan(TsLit(m), NanosConv(a)) if m >= 0 && nanosUp(m).isDefined =>
      LessThan(Literal(nanosUp(m).get, LongType), a)
    case EqualTo(TsLit(m), NanosConv(a)) if m >= 1 && nanosUp(m).isDefined =>
      And(GreaterThanOrEqual(a, Literal(nanos(m).get, LongType)),
        LessThanOrEqual(a, Literal(nanosUp(m).get, LongType)))
  }
}

/** Session-extensions entry point:
  * `.config("spark.sql.extensions", "graft.plans.GraftExtensions")`.
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(ext: SparkSessionExtensions): Unit =
    ext.injectOptimizerRule(_ => NanoTsPushdown)
}
