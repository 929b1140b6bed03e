package graft.plans

import org.apache.spark.sql.catalyst.expressions.Cast
import org.apache.spark.sql.catalyst.expressions.aggregate.{AggregateExpression, Count}
import org.apache.spark.sql.catalyst.plans.logical.{Aggregate, LogicalPlan}
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.types._
import graft.functions.BitmapDistinct

/** Catalyst optimizer rule (SURVEY §2.10 — `injectOptimizerRule`, the
  * extension tier [[AsofJoinStrategy]]'s planner hook doesn't cover):
  * rewrite exact `COUNT(DISTINCT x)` over integral keys to the engine's
  * mergeable [[BitmapDistinct]] aggregate.
  *
  * Why: Catalyst plans distinct counts either as two keyed exchanges
  * (one distinct) or an Expand that duplicates EVERY input row per
  * aggregate group (mixed/multiple distincts) — at 100 TB the shuffle
  * carries a row per distinct value per group, twice. The bitmap form
  * is one ordinary partial-aggregated pass: map-side bitmaps merge
  * before the single exchange, whose volume is the compressed bitmap
  * size, independent of row count. The result is bit-identical (both
  * are EXACT and ignore NULLs) — which the whole oracle suite proves,
  * since the rewrite is ON in every engine session (Verify/Bench/
  * tests): every green count-distinct gate is also a green gate on this
  * rule. q263 adds the targeted parity check; PlanSpec pins the plan
  * shape (no Expand, ObjectHashAggregate, one exchange).
  *
  * Scope guard: single-argument, unfiltered, integral-typed distinct
  * counts only — strings/doubles/dates keep Spark's planning, DISTINCT
  * with FILTER keeps its semantics, multi-arg distinct tuples are not
  * bitmap-representable. The child is cast to LONG explicitly (analysis
  * is over; nothing will insert the implicit cast). Disable with
  * `spark.graft.rewrite.countDistinctBitmap=false`.
  */
object RewriteCountDistinctBitmap extends Rule[LogicalPlan] {

  val ConfKey = "spark.graft.rewrite.countDistinctBitmap"

  private def integral(dt: DataType): Boolean = dt match {
    case ByteType | ShortType | IntegerType | LongType => true
    case _ => false
  }

  override def apply(plan: LogicalPlan): LogicalPlan =
    if (!conf.getConfString(ConfKey, "false").toBoolean) plan
    else plan.transformUp {
      case a: Aggregate => a.transformExpressionsUp {
        case AggregateExpression(Count(Seq(c)), mode, true, None, id)
            if integral(c.dataType) =>
          val asLong = if (c.dataType == LongType) c else Cast(c, LongType)
          AggregateExpression(BitmapDistinct(asLong), mode,
            isDistinct = false, filter = None, resultId = id)
      }
    }
}
