package graft.plans

import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.plans.logical.{Filter, LogicalPlan}
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.types.StringType
import org.apache.spark.unsafe.types.UTF8String

/** Optimizer rule: rewrite `substring(s, 1, n) = 'lit'` (with
  * `length('lit') = n`) into `StartsWith(s, 'lit')` — the companion of
  * [[YearRangeRewrite]] for string prefixes.
  *
  * Why this matters at 100 TB: `StartsWith` is one of the handful of string
  * predicates the parquet source translates (`PushedFilters:
  * [StringStartsWith(...)]`), pruning row groups via min/max statistics —
  * and on prefix-sorted or prefix-partitioned layouts it prunes whole
  * files. `substring(...) = lit` is a function of the column: nothing
  * pushes it, so the natural SQL spelling of "keys in this prefix range"
  * scans everything. Same philosophy as the year rule: meet SQL users at
  * the spelling they write.
  *
  * Semantics are exact for the guarded shape: for any non-null string s,
  * `substring(s, 1, n) = lit` with `len(lit) = n` ⟺ `s.startsWith(lit)`
  * (if s is shorter than n, the substring is a strict prefix of s shorter
  * than lit, which cannot equal a length-n literal — and startsWith is
  * false); NULL input yields NULL under both forms. Literals of a length
  * OTHER than n are not rewritten: `substring(s,1,n) = shorter` can still
  * be true when s itself is short, which startsWith cannot express — the
  * rule leaves those untouched rather than approximate. Only 1-based
  * from-the-start substrings qualify; any other start offset is not a
  * prefix. */
object PrefixPushdownRewrite extends Rule[LogicalPlan] {

  private def prefixed(sub: Expression, l: Literal): Option[Expression] =
    (sub, l.value) match {
      case (Substring(s, IntegerLiteral(1), IntegerLiteral(n)), v: UTF8String)
          if s.dataType == StringType && s.deterministic &&
            l.dataType == StringType && v.numChars == n =>
        Some(StartsWith(s, l))
      case _ => None
    }

  private def rewrite(e: Expression): Expression = e match {
    case eq @ EqualTo(sub: Substring, l: Literal) =>
      prefixed(sub, l).getOrElse(eq)
    case eq @ EqualTo(l: Literal, sub: Substring) =>
      prefixed(sub, l).getOrElse(eq)
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
