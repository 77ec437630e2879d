package graft.plans

import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.plans.logical.{Filter, LogicalPlan}
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.types.{LongType, TimestampType}

/** Optimizer rule: derive parquet-pushable raw-epoch range predicates
  * from comparisons on `timestamp_micros(ns DIV 1000)`.
  *
  * Motivation: nanosecond-typed parquet columns are read as raw longs
  * (Spark rejects TIMESTAMP(NANOS)), and the µs-truncating conversion
  * wraps the column in an expression no datasource can push — every
  * naive `WHERE ts BETWEEN …` becomes a full scan. `Tables.eventsRange`
  * does the rewrite by hand for the engine's own scans; this rule does
  * it for ANY user filter, automatically.
  *
  * For u ≥ 0 and x the raw ns long. `DIV` truncates toward zero, so for
  * pre-epoch x < 0 the quotient rounds UP (-500 DIV 1000 = 0) — the
  * derived bounds must account for negative ns or they would wrongly
  * filter pre-1970 rows. With t = trunc(x/1000):
  *   t >= u  ⟹  x >= u*1000            (u ≥ 1; x<0 gives t ≤ 0 < u)
  *   t >= 0  ⟹  x >= -999              (t ≥ 0 ⟺ x > -1000)
  *   t <= u  ⟹  x <= u*1000 + 999      (x<0 satisfies both sides)
  *   t >  u  ⟹  x >= (u+1)*1000        (u+1 ≥ 1 case of >=)
  *   t <  u  ⟹  x <= u*1000 - 1 (u ≥ 1);  t < 0 ⟹ x <= -1000
  *   t =  u  ⟹  u*1000 <= x <= u*1000 + 999 (u ≥ 1)
  *   t =  0  ⟹  -999 <= x <= 999
  *
  * The derived predicate is ADDED as a conjunct (the original comparison
  * stays), so this is safe even at the truncation edges: the addition
  * only needs to be implied by the original, and FileSourceStrategy
  * pushes the raw-attribute conjunct to the reader while the original
  * remains as the exact post-scan filter.
  */
object NsEpochRangeRule extends Rule[LogicalPlan] {

  /** Matches timestamp_micros(x DIV 1000) and yields x. */
  private object MicrosOfNs {
    def unapply(e: Expression): Option[Expression] = e match {
      case MicrosToTimestamp(d: IntegralDivide) => d.right match {
        case Literal(1000L, LongType) => Some(d.left)
        case _ => None
      }
      case _ => None
    }
  }

  private def usOf(l: Literal): Option[Long] = l match {
    case Literal(v: Long, TimestampType) if v >= 0 &&
      v <= Long.MaxValue / 1000 - 1 => Some(v)
    case _ => None
  }

  private def geBound(u: Long): Long = if (u == 0L) -999L else u * 1000L
  private def ltBound(u: Long): Long = if (u == 0L) -1000L else u * 1000L - 1L

  private def derived(cmp: Expression): Option[Expression] = cmp match {
    case GreaterThanOrEqual(MicrosOfNs(x), l: Literal) =>
      usOf(l).map(u => GreaterThanOrEqual(x, Literal(geBound(u))))
    case LessThanOrEqual(MicrosOfNs(x), l: Literal) =>
      usOf(l).map(u => LessThanOrEqual(x, Literal(u * 1000L + 999L)))
    case GreaterThan(MicrosOfNs(x), l: Literal) =>
      usOf(l).map(u => GreaterThanOrEqual(x, Literal((u + 1) * 1000L)))
    case LessThan(MicrosOfNs(x), l: Literal) =>
      usOf(l).map(u => LessThanOrEqual(x, Literal(ltBound(u))))
    case EqualTo(MicrosOfNs(x), l: Literal) =>
      usOf(l).map(u => And(
        GreaterThanOrEqual(x, Literal(geBound(u))),
        LessThanOrEqual(x, Literal(u * 1000L + 999L))))
    // literal-on-the-left forms
    case GreaterThanOrEqual(l: Literal, MicrosOfNs(x)) =>
      usOf(l).map(u => LessThanOrEqual(x, Literal(u * 1000L + 999L)))
    case LessThanOrEqual(l: Literal, MicrosOfNs(x)) =>
      usOf(l).map(u => GreaterThanOrEqual(x, Literal(geBound(u))))
    case _ => None
  }

  private def augment(cond: Expression): Expression = cond match {
    case And(a, b) => And(augment(a), augment(b))
    case other => derived(other) match {
      case Some(extra) => And(other, extra)
      case None => other
    }
  }

  override def apply(plan: LogicalPlan): LogicalPlan = plan.transform {
    case f @ Filter(cond, child) =>
      val next = augment(cond)
      if (next fastEquals cond) f else Filter(next, child)
  }
}

/** SparkSessionExtensions entry point:
  * `SparkSession.builder().withExtensions(new GraftExtensions)` — or at
  * runtime `spark.sessionState.experimentalMethods.extraOptimizations`.
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(e: SparkSessionExtensions): Unit = {
    e.injectOptimizerRule(_ => NsEpochRangeRule)
    e.injectOptimizerRule(_ => BucketPruneRule)
  }
}
