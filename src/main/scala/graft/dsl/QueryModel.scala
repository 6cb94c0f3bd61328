package graft.dsl

import graft.core.{EntityModel, Period, StreamTableType}
import org.apache.spark.sql.Column

import scala.concurrent.duration._

/** Join spec — equi/bounded join with at most ONE right source
  * (the reference enforces max 2 tables per query,
  * `/root/reference/src/Query/Builders/Common/JoinLimitationEnforcer.cs:14-31`,
  * and only INNER + LEFT OUTER, `:169-196`).
  */
final case class JoinSpec(
    right: EntityModel[_],
    condition: Column,
    joinType: String, // "inner" | "left_outer"
    withinSeconds: Option[Long] = None,
    forbidDefaultWithin: Boolean = false,
    // Late-arrival tolerance for BOTH sides of a stream-stream join: this
    // becomes the watermark delay, which at scale is the state-retention /
    // late-drop knob (retained state ≈ delay + WITHIN range). None → the
    // planner default (Planner.DefaultJoinGraceSeconds).
    graceSeconds: Option[Long] = None
)

/** Multi-timeframe tumbling spec — one DSL call fans out to N windowed
  * aggregations (the reference's `Windows` record,
  * `/root/reference/src/Query/Dsl/Windows.cs:3-9`, + Tumbling args
  * `KsqlQueryable.cs:70-94`).
  */
final case class TumblingSpec(
    timeframes: Seq[Period],
    baseUnitSeconds: Int = 10,
    grace: FiniteDuration = 3.seconds,
    continuation: Boolean = false
)

/** Hopping (sliding) window spec (`KsqlQueryable.cs:101-123`). */
final case class HoppingSpec(
    size: FiniteDuration,
    advanceBy: FiniteDuration,
    grace: Option[FiniteDuration] = None
)

/** Market-schedule session restriction — the `TimeFrame<TSchedule>` DSL
  * (`/root/reference/src/Query/Dsl/KsqlQueryable.cs:127-184`): equality
  * join keys to a schedule table plus open/close boundary comparisons
  * with configurable inclusivity (:161-183).
  */
final case class ScheduleSpec(
    schedule: EntityModel[_],
    joinKeys: Seq[(String, String)], // (fact col, schedule col)
    openCol: String,
    closeCol: String,
    openInclusive: Boolean = true,
    closeInclusive: Boolean = false,
    dayKey: Option[String] = None
)

/** The query IR — the Spark analog of the reference's `KsqlQueryModel`
  * (`/root/reference/src/Query/Dsl/KsqlQueryModel.cs:11-136`): a clause
  * container the planner lowers to DataFrame transformations instead of
  * KSQL text.
  */
final case class QueryModel(
    source: EntityModel[_],
    join: Option[JoinSpec] = None,
    wheres: Seq[Column] = Nil,
    groupBy: Seq[Column] = Nil,
    groupByNames: Seq[String] = Nil,
    having: Option[Column] = None,
    select: Seq[Column] = Nil,
    tumbling: Option[TumblingSpec] = None,
    hopping: Option[HoppingSpec] = None,
    schedule: Option[ScheduleSpec] = None,
    orderBy: Seq[Column] = Nil,
    limit: Option[Int] = None,
    timeKeyOverride: Option[String] = None,
    aggregateInSelect: Boolean = false
) {

  def timeKey: Option[String] = timeKeyOverride.orElse(source.timeKey)

  /** Aggregate query ⇒ Table (upsert), else Stream — the reference's
    * inference rule (`KsqlQueryModel.cs:114-124`: GroupBy ∨ Tumbling ∨
    * Hopping ∨ aggregate-in-Select ⇒ aggregate).
    */
  def isAggregateQuery: Boolean =
    groupBy.nonEmpty || tumbling.nonEmpty || hopping.nonEmpty || aggregateInSelect

  def inferredType: StreamTableType =
    if (isAggregateQuery) StreamTableType.Table else StreamTableType.Stream
}
