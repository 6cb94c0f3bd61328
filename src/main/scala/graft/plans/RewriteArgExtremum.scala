package graft.plans

import graft.functions.MinByObject
import org.apache.spark.sql.catalyst.expressions.UnsafeRow
import org.apache.spark.sql.catalyst.expressions.aggregate.{AggregateExpression, MaxBy, MinBy}
import org.apache.spark.sql.catalyst.plans.logical.{Aggregate, LogicalPlan}
import org.apache.spark.sql.catalyst.rules.Rule

/** Rewrite `min_by`/`max_by` with a non-mutable carried value (struct,
  * string, array, …) to [[MinByObject]].
  *
  * The built-in declarative `MinBy`/`MaxBy` put the carried value into
  * the aggregation buffer; when that value's type is not mutable in an
  * `UnsafeRow` the planner rejects hash aggregation and the whole
  * `Aggregate` — including every OTHER function in it — falls back to
  * SortAggregate: a per-partition sort of all input rows. At 100 TB
  * that turns a linear hash pass into n·log(n) sorts. The typed
  * imperative [[MinByObject]] keeps an opaque buffer, so the planner
  * picks ObjectHashAggregate instead (hash partials, no sort).
  *
  * Results are identical except for ties in the ordering expression,
  * where both forms are documented as nondeterministic. Mutable-typed
  * carries (ints, doubles…) are left alone — for those the built-in
  * stays in codegen'd HashAggregate, which is better still.
  *
  * Injected by [[graft.GraftExtensions]] as an optimizer rule; the
  * rewrite preserves dataType and nullability, so it is safe after
  * analysis.
  */
object RewriteArgExtremum extends Rule[LogicalPlan] {

  override def apply(plan: LogicalPlan): LogicalPlan = plan.transform {
    case agg: Aggregate =>
      agg.transformExpressions {
        case ae @ AggregateExpression(MinBy(v, o), _, false, _, _)
            if v.resolved && !UnsafeRow.isMutable(v.dataType) =>
          ae.copy(aggregateFunction = MinByObject(v, o))
        case ae @ AggregateExpression(MaxBy(v, o), _, false, _, _)
            if v.resolved && !UnsafeRow.isMutable(v.dataType) =>
          ae.copy(aggregateFunction = MinByObject(v, o, reverse = true))
      }
  }
}
