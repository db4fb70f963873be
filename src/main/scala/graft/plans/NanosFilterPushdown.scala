package graft.plans

import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.plans.logical.{Filter, LogicalPlan}
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.types.{LongType, TimestampType}

/** Restores parquet predicate pushdown for event-time filters on the
  * nanosecond `events.ts` column.
  *
  * `events.parquet` stores TIMESTAMP(NANOS), which the vectorized reader
  * only accepts as a raw long (`spark.sql.legacy.parquet.nanosAsLong`), so
  * [[graft.tables.Tables.events]] exposes
  * `ts = timestamp_micros(ts_nanos DIV 1000)`.  A user filter
  * `ts >= TIMESTAMP '…'` then sits on top of that conversion and never
  * reaches the scan — at 100 TB that is a full-table read for a one-day
  * range query.
  *
  * This rule derives, from each comparison of that conversion pattern with
  * a timestamp literal, an IMPLIED bound on the raw nanos column and ANDs
  * it into the filter.  The original predicate is kept, so correctness
  * never depends on the derivation being tight — the added conjunct only
  * has to be implied by (i.e. no stricter than) the original:
  *
  *   - `trunc(e/1000) >= m`  ⟹  `e >= m*1000`          (for m > 0)
  *   - `trunc(e/1000) >  m`  ⟹  `e >= (m+1)*1000`
  *   - `trunc(e/1000) <= m`  ⟹  `e <= m*1000 + 999`
  *   - `trunc(e/1000) <  m`  ⟹  `e <= m*1000 - 1`
  *   - `trunc(e/1000) =  m`  ⟹  both bounds
  *
  * (`IntegralDivide` truncates toward zero; with the literal micros m > 0
  * — i.e. any timestamp after the epoch — each implication above holds for
  * every long e, negative or not.  Literals at or before the epoch are
  * left alone.)  The new conjunct compares the bare scan attribute, so the
  * stock `PushDownPredicates` + DataSource strategy carry it into the
  * parquet reader as a min/max row-group + page filter.
  *
  * Injected via [[graft.GraftExtensions]] (`injectOptimizerRule`), running
  * inside the operator-optimization fixed point; the duplicate check below
  * keeps it convergent.
  */
object NanosFilterPushdown extends Rule[LogicalPlan] with PredicateHelper {

  /** Matches `timestamp_micros(e DIV 1000)` and yields the raw `e`.
    * `e` must be deterministic: the implied conjunct RE-EVALUATES it, and
    * a nondeterministic `e` (say one involving rand()) could disagree
    * with the original predicate's evaluation row by row. */
  private object MicrosOfNanos {
    def unapply(expr: Expression): Option[Expression] = expr match {
      case MicrosToTimestamp(IntegralDivide(e, Literal(d, _), _))
          if (d == 1000L || d == 1000) && e.deterministic => Some(e)
      case _ => None
    }
  }

  /** Positive epoch-micros literal (timestamps after 1970 only — the
    * implication proofs in the scaladoc assume m > 0). */
  private object PosMicrosLit {
    def unapply(expr: Expression): Option[Long] = expr match {
      case Literal(m: Long, TimestampType) if m > 0 => Some(m)
      case _ => None
    }
  }

  /** Matches `date_trunc(unit, timestamp_micros(e DIV 1000))` for units
    * whose bucket length is bounded; yields the raw `e` and a conservative
    * MAXIMUM bucket length in micros.  The bounds derived from
    * `trunc(v) cmp m` use only two facts — the trunc result is the bucket's
    * start instant (≤ v), and the bucket spans less than `len` — so they
    * stay implied in any session timezone (the 25-hour "day" covers DST;
    * months/quarters/years get their longest calendar span plus an hour). */
  private object TruncOfNanos {
    private val H = 3600L * 1000000L
    private val maxLenUs: Map[String, Long] = Map(
      "minute" -> 60L * 1000000L, "hour" -> H,
      "day" -> 25L * H, "week" -> (7L * 24 + 1) * H,
      "month" -> (31L * 24 + 1) * H, "quarter" -> (92L * 24 + 1) * H,
      "year" -> (366L * 24 + 1) * H)
    def unapply(expr: Expression): Option[(Expression, Long)] = expr match {
      case TruncTimestamp(Literal(fmt, _), MicrosOfNanos(e), _) if fmt != null =>
        maxLenUs.get(fmt.toString.toLowerCase(java.util.Locale.ROOT)).map(e -> _)
      case _ => None
    }
  }

  private def geq(e: Expression, v: Long) = GreaterThanOrEqual(e, Literal(v, LongType))
  private def leq(e: Expression, v: Long) = LessThanOrEqual(e, Literal(v, LongType))

  /** The implied raw-nanos bound(s) for one conjunct, if it matches. */
  private def implied(conjunct: Expression): Seq[Expression] =
    try {
      conjunct match {
        case GreaterThanOrEqual(MicrosOfNanos(e), PosMicrosLit(m)) =>
          Seq(geq(e, Math.multiplyExact(m, 1000L)))
        case GreaterThan(MicrosOfNanos(e), PosMicrosLit(m)) =>
          Seq(geq(e, Math.multiplyExact(Math.addExact(m, 1L), 1000L)))
        case LessThanOrEqual(MicrosOfNanos(e), PosMicrosLit(m)) =>
          Seq(leq(e, Math.addExact(Math.multiplyExact(m, 1000L), 999L)))
        case LessThan(MicrosOfNanos(e), PosMicrosLit(m)) =>
          Seq(leq(e, Math.subtractExact(Math.multiplyExact(m, 1000L), 1L)))
        case EqualTo(MicrosOfNanos(e), PosMicrosLit(m)) =>
          Seq(geq(e, Math.multiplyExact(m, 1000L)),
            leq(e, Math.addExact(Math.multiplyExact(m, 1000L), 999L)))
        // date_trunc(unit, ·) comparisons: v >= trunc(v) and
        // v < trunc(v) + len give timezone-safe bounds (see TruncOfNanos)
        case GreaterThanOrEqual(TruncOfNanos(e, _), PosMicrosLit(m)) =>
          Seq(geq(e, Math.multiplyExact(m, 1000L)))
        case GreaterThan(TruncOfNanos(e, _), PosMicrosLit(m)) =>
          Seq(geq(e, Math.multiplyExact(Math.addExact(m, 1L), 1000L)))
        case LessThanOrEqual(TruncOfNanos(e, len), PosMicrosLit(m)) =>
          Seq(leq(e, Math.subtractExact(
            Math.multiplyExact(Math.addExact(m, len), 1000L), 1L)))
        case LessThan(TruncOfNanos(e, len), PosMicrosLit(m)) =>
          Seq(leq(e, Math.subtractExact(
            Math.multiplyExact(Math.addExact(Math.subtractExact(m, 1L), len), 1000L), 1L)))
        case EqualTo(TruncOfNanos(e, len), PosMicrosLit(m)) =>
          Seq(geq(e, Math.multiplyExact(m, 1000L)),
            leq(e, Math.subtractExact(
              Math.multiplyExact(Math.addExact(m, len), 1000L), 1L)))
        // literal-on-the-left orientations: flip once and re-match (the
        // recursion terminates — after the flip the literal is on the right)
        case GreaterThanOrEqual(l @ PosMicrosLit(_), r) => implied(LessThanOrEqual(r, l))
        case GreaterThan(l @ PosMicrosLit(_), r)        => implied(LessThan(r, l))
        case LessThanOrEqual(l @ PosMicrosLit(_), r)    => implied(GreaterThanOrEqual(r, l))
        case LessThan(l @ PosMicrosLit(_), r)           => implied(GreaterThan(r, l))
        case EqualTo(l @ PosMicrosLit(_), r)            => implied(EqualTo(r, l))
        case _ => Nil
      }
    } catch {
      // a bound that overflows Long can't be represented — add nothing
      case _: ArithmeticException => Nil
    }

  override def apply(plan: LogicalPlan): LogicalPlan = plan.transform {
    case f @ Filter(cond, child) =>
      val conjuncts = splitConjunctivePredicates(cond)
      val additions = conjuncts.flatMap(implied)
        .filterNot(b => conjuncts.exists(_.semanticEquals(b)))
        .distinct
      if (additions.isEmpty) f
      else Filter((conjuncts ++ additions).reduce(And), child)
  }
}
