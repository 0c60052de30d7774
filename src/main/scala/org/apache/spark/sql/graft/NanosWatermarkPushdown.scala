package org.apache.spark.sql.graft

import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.types.{LongType, TimestampType}

/** Optimizer rule restoring predicate pushdown for nanosecond-timestamp
  * columns read as raw longs.
  *
  * Parquet TIMESTAMP(NANOS) columns are read via
  * `spark.sql.legacy.parquet.nanosAsLong` as nanos-since-epoch longs and
  * converted with `timestamp_micros(ts div 1000)` (see
  * `graft.core.Tables`). A watermark filter on the converted column —
  * `timestamp_micros(ts div 1000) > TIMESTAMP'...'` — is a predicate on a
  * computed expression, so only `IsNotNull` reaches the parquet scan and
  * row-group pruning is lost: at 100 TB the incremental-scan optimization
  * (the reference's whole extraction strategy, adf/pipeline.json:129)
  * silently degrades to a full scan.
  *
  * This rule rewrites such comparisons into raw-nanos space, where they are
  * plain attribute-vs-literal predicates that `FileSourceStrategy` pushes
  * into the scan:
  * {{{
  *   micros(t div 1000) >  L  ⟺  t >  L*1000 + 999
  *   micros(t div 1000) >= L  ⟺  t >= L*1000
  *   micros(t div 1000) <  L  ⟺  t <  L*1000
  *   micros(t div 1000) <= L  ⟺  t <= L*1000 + 999
  * }}}
  * (truncating division, valid for non-negative nanos — i.e. post-1970
  * event time, which the conversion in Tables already assumes).
  *
  * Registered through [[GraftExtensions]] (`injectOptimizerRule`); injected
  * rules run after the main optimizer batches, so the timestamp literal has
  * already been constant-folded and the filter has already been pushed
  * through the converting Project down to the relation.
  */
object NanosWatermarkPushdown extends Rule[LogicalPlan] {

  /** Matches `timestamp_micros(t div 1000)` over a long column. */
  private object MicrosOfNanos {
    def unapply(e: Expression): Option[Expression] = e match {
      case MicrosToTimestamp(IntegralDivide(t, Literal(1000L, LongType), _))
          if t.dataType == LongType => Some(t)
      case _ => None
    }
  }

  private def micros(l: Literal): Long = l.value.asInstanceOf[Long]
  private def nanosLit(v: Long): Literal = Literal(v, LongType)

  override def apply(plan: LogicalPlan): LogicalPlan = plan transformAllExpressions {
    case GreaterThan(MicrosOfNanos(t), l @ Literal(_, TimestampType)) =>
      GreaterThan(t, nanosLit(micros(l) * 1000L + 999L))
    case GreaterThanOrEqual(MicrosOfNanos(t), l @ Literal(_, TimestampType)) =>
      GreaterThanOrEqual(t, nanosLit(micros(l) * 1000L))
    case LessThan(MicrosOfNanos(t), l @ Literal(_, TimestampType)) =>
      LessThan(t, nanosLit(micros(l) * 1000L))
    case LessThanOrEqual(MicrosOfNanos(t), l @ Literal(_, TimestampType)) =>
      LessThanOrEqual(t, nanosLit(micros(l) * 1000L + 999L))
    // literal-on-the-left forms
    case GreaterThan(l @ Literal(_, TimestampType), MicrosOfNanos(t)) =>
      GreaterThan(nanosLit(micros(l) * 1000L), t)
    case GreaterThanOrEqual(l @ Literal(_, TimestampType), MicrosOfNanos(t)) =>
      GreaterThanOrEqual(nanosLit(micros(l) * 1000L + 999L), t)
    case LessThan(l @ Literal(_, TimestampType), MicrosOfNanos(t)) =>
      LessThan(nanosLit(micros(l) * 1000L + 999L), t)
    case LessThanOrEqual(l @ Literal(_, TimestampType), MicrosOfNanos(t)) =>
      LessThanOrEqual(nanosLit(micros(l) * 1000L), t)
  }
}
