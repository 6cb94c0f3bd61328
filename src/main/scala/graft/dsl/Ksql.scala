package graft.dsl

import graft.core.{EntityModel, Period}
import org.apache.spark.sql.Column

import scala.concurrent.duration._

/** Staged typed query DSL.
  *
  * Re-expresses the reference's fluent builder state machine
  * (`KsqlQueryRoot` → `KsqlQueryable` → `KsqlGroupedQueryable`,
  * `/root/reference/src/Query/Dsl/`) with the same stage-ordering
  * guards, surfaced as compile-time structure where possible and
  * runtime `IllegalStateException`s for the reference's documented
  * error behavior:
  *
  *   - `From` callable once (`KsqlQueryRoot.cs:16-23`)
  *   - `Join` only immediately after `From`, max 2 sources
  *     (`KsqlQueryable.cs:190-191`, `JoinLimitationEnforcer.cs:14-31`)
  *   - `Where` before `GroupBy`/`Select` (`KsqlQueryable.cs:26-27`)
  *   - `GroupBy` before grouped `Select` (`KsqlQueryable.cs:61-62`)
  *   - `Having` NOT supported with Tumbling windows
  *     (`KsqlGroupedQueryable.cs:10-12,29-30`)
  *
  * Unlike the reference there is no expression-tree → SQL translation:
  * clauses are real Spark `Column`s and the output is a [[QueryModel]]
  * lowered by [[graft.plans.Planner]] straight to DataFrame ops, so
  * Catalyst owns pushdown/pruning/join strategy.
  */
object Ksql {
  def from(source: EntityModel[_]): QueryStage = QueryStage(QueryModel(source))
}

final case class QueryStage(model: QueryModel, joined: Boolean = false) {

  /** INNER JOIN — only immediately after From; second join throws
    * (max 2 sources, `JoinLimitationEnforcer.cs:20-31`).
    */
  def join(right: EntityModel[_], on: Column): QueryStage =
    addJoin(right, on, "inner")

  /** LEFT OUTER JOIN (`JoinExpressionVisitor` supports INNER + LEFT
    * OUTER only; GroupJoin/FULL/RIGHT/CROSS rejected,
    * `JoinLimitationEnforcer.cs:169-196`).
    */
  def leftJoin(right: EntityModel[_], on: Column): QueryStage =
    addJoin(right, on, "left_outer")

  /** Stream-stream time bound: explicit WITHIN (seconds). Without it the
    * planner injects the 300 s default exactly like
    * `KsqlCreateStatementBuilder.cs:362-376`.
    */
  def within(seconds: Long): QueryStage = {
    val j = model.join.getOrElse(
      throw new IllegalStateException("WITHIN requires a preceding Join")
    )
    copy(model = model.copy(join = Some(j.copy(withinSeconds = Some(seconds)))))
  }

  /** Late-arrival grace for a stream-stream join — becomes the watermark
    * delay on both inputs (the state-retention knob; analogous to the
    * windowed GRACE PERIOD, `KsqlQueryable.cs:70-94`).
    */
  def joinGrace(seconds: Long): QueryStage = {
    val j = model.join.getOrElse(
      throw new IllegalStateException("JoinGrace requires a preceding Join")
    )
    require(seconds >= 0, "join grace must be non-negative")
    copy(model = model.copy(join = Some(j.copy(graceSeconds = Some(seconds)))))
  }

  def forbidDefaultWithin: QueryStage = {
    val j = model.join.getOrElse(
      throw new IllegalStateException("ForbidDefaultWithin requires a preceding Join")
    )
    copy(model = model.copy(join = Some(j.copy(forbidDefaultWithin = true))))
  }

  private def addJoin(right: EntityModel[_], on: Column, jt: String): QueryStage = {
    if (model.join.isDefined)
      throw new IllegalStateException(
        "KSQL supports at most 2 sources per query (JoinLimitationEnforcer)"
      )
    if (model.wheres.nonEmpty || model.groupBy.nonEmpty || model.select.nonEmpty)
      throw new IllegalStateException("Join must be called immediately after From")
    copy(model = model.copy(join = Some(JoinSpec(right, on, jt))), joined = true)
  }

  def where(pred: Column): QueryStage = {
    if (model.groupBy.nonEmpty || model.select.nonEmpty)
      throw new IllegalStateException("Where must be called before GroupBy/Select")
    graft.plans.AggregateDetection.forbidIn("WHERE")(Seq(pred))
    copy(model = model.copy(wheres = model.wheres :+ pred))
  }

  /** Multi-timeframe tumbling windows over the entity's time key
    * (`KsqlQueryable.cs:70-94`). Timeframe tokens are normalized,
    * deduped and sorted ascending like `KsqlQueryModel.cs:127-135`.
    */
  def tumbling(
      timeframes: Seq[Period],
      baseUnitSeconds: Int = 10,
      grace: FiniteDuration = 3.seconds,
      continuation: Boolean = false
  ): QueryStage = {
    require(model.timeKey.isDefined, "Tumbling requires an entity time key")
    val norm = timeframes.distinct.sortBy(p => p.fixedSeconds.getOrElse(Long.MaxValue))
    copy(model =
      model.copy(tumbling = Some(TumblingSpec(norm, baseUnitSeconds, grace, continuation)))
    )
  }

  def hopping(
      size: FiniteDuration,
      advanceBy: FiniteDuration,
      grace: Option[FiniteDuration] = None
  ): QueryStage = {
    require(model.timeKey.isDefined, "Hopping requires an entity time key")
    // non-divisible SIZE/ADVANCE pairs are legal (`KsqlQueryable.cs:100-123`
    // and ksqlDB accept them; Spark's window(size, slide) does too), but
    // advance > size is rejected everywhere downstream (ksqlDB, Kafka
    // Streams, and Spark's analysis-time PARAMETER_CONSTRAINT_VIOLATION) —
    // fail here with a readable message instead
    require(advanceBy <= size, "advanceBy must not exceed the window size")
    copy(model = model.copy(hopping = Some(HoppingSpec(size, advanceBy, grace))))
  }

  /** Market-schedule session restriction (`TimeFrame`,
    * `KsqlQueryable.cs:127-184`).
    */
  def timeFrame(spec: ScheduleSpec): QueryStage =
    copy(model = model.copy(schedule = Some(spec)))

  def groupBy(keys: (String, Column)*): GroupedStage = {
    if (model.select.nonEmpty)
      throw new IllegalStateException("GroupBy must be called before Select")
    graft.plans.AggregateDetection.forbidIn("GROUP BY keys")(keys.map(_._2))
    GroupedStage(
      model.copy(groupBy = keys.map(_._2), groupByNames = keys.map(_._1))
    )
  }

  /** Non-grouped projection. An aggregate in the projection classifies
    * the query as a Table (AggregateDetectionVisitor semantics,
    * `KsqlQueryable.cs:53-55` / `KsqlQueryModel.IsAggregateQuery`).
    */
  def select(cols: Column*): BuiltQuery = BuiltQuery(
    model.copy(
      select = cols,
      aggregateInSelect = cols.exists(graft.plans.AggregateDetection.containsAggregate)
    )
  )
}

final case class GroupedStage(model: QueryModel) {

  /** Post-aggregation filter. Explicitly NOT supported with Tumbling
    * windows — parity with `KsqlGroupedQueryable.cs:10-12,29-30` (the
    * underlying ksqlDB rejects HAVING on windowed tables). Spark could
    * express it; we keep the guard for declared-behavior parity.
    */
  def having(pred: Column): GroupedStage = {
    if (model.tumbling.isDefined)
      throw new IllegalStateException(
        "HAVING is not supported together with Tumbling windows"
      )
    copy(model = model.copy(having = Some(pred)))
  }

  def select(cols: Column*): BuiltQuery = BuiltQuery(model.copy(select = cols))
}

/** Terminal stage: pull-query-only refinements (ORDER BY / LIMIT are
  * pull-side in the reference — push-query ORDER BY only warns,
  * `/root/reference/src/Query/Pipeline/DMLQueryGenerator.cs:508-512`).
  */
final case class BuiltQuery(model: QueryModel) {

  /** ORDER BY with function-context validation: functions flagged
    * `allowedInOrderBy = false` in the registry (SPLIT, COLLECT_*,
    * aggregates — `KsqlFunctionRegistry.cs:17-77`) are rejected here,
    * reproducing the reference's validation errors.
    */
  def orderBy(cols: Column*): BuiltQuery = {
    cols.foreach { c =>
      org.apache.spark.sql.graftbridge.ColumnBridge
        .functionNames(c)
        .find { n =>
          graft.functions.KFunctions.registry
            .get(n.toUpperCase)
            .exists(!_.allowedInOrderBy)
        }
        .foreach { bad =>
          throw new IllegalStateException(s"function $bad is not allowed in ORDER BY")
        }
    }
    copy(model = model.copy(orderBy = cols))
  }

  def limit(n: Int): BuiltQuery = copy(model = model.copy(limit = Some(n)))
  def build(): QueryModel = model
}
