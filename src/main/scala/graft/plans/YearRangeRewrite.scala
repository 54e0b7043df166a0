package graft.plans

import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.plans.logical.{Filter, LogicalPlan}
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.types.{DateType, TimestampNTZType}

/** Optimizer rule: rewrite `year(d) = y` predicates into the equivalent
  * half-open range on the RAW column — `d >= 'y-01-01' AND d <
  * '(y+1)-01-01'` for DATE columns, and the matching timestamp bounds for
  * TIMESTAMP_NTZ columns (whose `year()` analyzes as `Year(Cast(d AS
  * DATE))`; the cast is unwrapped and the bounds land on the column).
  *
  * Why this matters at 100 TB: a range predicate on the raw column is a
  * plain comparison the parquet source understands — it reaches
  * `PushedFilters`, prunes row groups via min/max statistics, and prunes
  * partition directories on date-partitioned layouts. `year(d) = y` is a
  * function of the column: no source pushes it, so every year-scoped query
  * scans every year. The repo's query code already applies this rewrite by
  * hand (`graft.Ops.inYear`, used across the OLAP pack); this rule gives
  * the same plan to a SQL user who writes the natural `WHERE year(d) =
  * 1995` — the engine meets users where they are instead of asking them to
  * know the trick.
  *
  * Semantics are exact: for any date x, year(x) = y ⟺ 'y-01-01' <= x <
  * '(y+1)-01-01', and the NTZ cast-to-date truncates, so for any
  * timestamp_ntz t, year(date(t)) = y ⟺ 'y-01-01T00:00' <= t <
  * '(y+1)-01-01T00:00' (proleptic Gregorian on both sides; NTZ has no
  * timezone to shift midnight). Session-timezone TIMESTAMP columns are
  * deliberately NOT rewritten: their date cast depends on the session
  * zone. Registered through [[graft.functions.GraftExtensions]]
  * (`injectOptimizerRule`) and usable ad hoc via
  * `spark.experimental.extraOptimizations`.
  */
object YearRangeRewrite extends Rule[LogicalPlan] {

  /** The raw column a post-analysis `Year(...)` child refers to, when the
    * rewrite is exact: a DATE expression, or a TIMESTAMP_NTZ one behind
    * the analyzer's implicit cast-to-date. */
  private def unwrap(d: Expression): Option[Expression] = d match {
    case Cast(a, DateType, _, _) if a.dataType == TimestampNTZType && a.deterministic =>
      Some(a)
    case a if a.dataType == DateType && a.deterministic => Some(a)
    case _ => None
  }

  private def bounds(col: Expression, y: Int): Option[(Literal, Literal)] =
    // years both java.sql.Date and LocalDateTime can express (y+1 included)
    if (y < 1 || y > 9998) None
    else col.dataType match {
      case DateType => Some((
        Literal.create(java.sql.Date.valueOf(f"$y%04d-01-01"), DateType),
        Literal.create(java.sql.Date.valueOf(f"${y + 1}%04d-01-01"), DateType)))
      case TimestampNTZType => Some((
        Literal.create(java.time.LocalDateTime.of(y, 1, 1, 0, 0), TimestampNTZType),
        Literal.create(java.time.LocalDateTime.of(y + 1, 1, 1, 0, 0), TimestampNTZType)))
      case _ => None
    }

  private def intOf(l: Literal): Option[Int] = l.value match {
    case i: Int => Some(i)
    case i: Long if i.isValidInt => Some(i.toInt)
    case i: Short => Some(i.toInt)
    case i: Byte => Some(i.toInt)
    case _ => None
  }

  private def ranged(d: Expression, l: Literal): Option[Expression] =
    for {
      col <- unwrap(d)
      y <- intOf(l)
      (lo, hi) <- bounds(col, y)
    } yield And(GreaterThanOrEqual(col, lo), LessThan(col, hi))

  private def rewrite(e: Expression): Expression = e match {
    case EqualTo(Year(d), l: Literal) => ranged(d, l).getOrElse(e)
    case EqualTo(l: Literal, Year(d)) => ranged(d, l).getOrElse(e)
    case And(a, b) => And(rewrite(a), rewrite(b))
    case Or(a, b) => Or(rewrite(a), rewrite(b))
    case other => other
  }

  override def apply(plan: LogicalPlan): LogicalPlan = plan transform {
    case f @ Filter(cond, child) =>
      val r = rewrite(cond)
      if (r fastEquals cond) f else Filter(r, child)
  }
}
