package graft.plans

import graft.core.{Period, StreamTableType}
import graft.dsl.{QueryModel, ScheduleSpec}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.{Column, DataFrame, SparkSession}

/** Lowers a [[QueryModel]] to DataFrame transformations.
  *
  * This is the whole replacement for the reference's 14.7k-LoC
  * translation module (`/root/reference/src/Query` — visitors +
  * statement builders): because Spark consumes logical plans rather
  * than SQL text, translation collapses to a direct declarative
  * lowering and Catalyst owns every physical decision (pushdown,
  * pruning, join strategy, partial aggregation, AQE).
  *
  * Semantic rewrites the reference applies that we keep (SURVEY §4):
  *   - aggregate ⇒ Table inference → output mode / sink choice
  *   - default `WITHIN 300 SECONDS` on stream-stream joins
  *     (`KsqlCreateStatementBuilder.cs:362-376`)
  *   - calendar months floor via `date_trunc` (Spark `window()` is
  *     fixed-length; the reference floors months client-side,
  *     `Periods.cs:16-19`)
  */
object Planner {

  val DefaultWithinSeconds = 300L

  /** Default watermark delay for stream-stream joins when the model
    * carries no explicit `joinGrace` — the late-data tolerance, and with
    * the WITHIN range, the state-retention bound.
    */
  val DefaultJoinGraceSeconds = 30L

  /** A multi-timeframe Tumbling spec reaching the single-query path would
    * silently plan only the first timeframe — the fan-out belongs to
    * [[DerivationPlanner]], so refuse loudly instead of truncating the spec.
    */
  private def soleTimeframe(t: graft.dsl.TumblingSpec): Period = {
    if (t.timeframes.size != 1)
      throw new IllegalStateException(
        s"Tumbling with ${t.timeframes.size} timeframes (${t.timeframes.mkString(", ")}) " +
          "cannot be planned as a single query; use DerivationPlanner / the " +
          "cascade API for multi-timeframe fan-out"
      )
    t.timeframes.head
  }

  /** Batch (pull-query) lowering. `catalog` resolves entity name → DataFrame. */
  def batch(model: QueryModel, catalog: String => DataFrame): DataFrame = {
    val base = sourceWithJoin(model, catalog, streaming = false)
    val filtered0 = model.wheres.foldLeft(base)(_.filter(_))
    val filtered = model.schedule.fold(filtered0) { s =>
      val tk = model.timeKey.getOrElse(
        throw new IllegalStateException("TimeFrame requires an entity time key")
      )
      applySchedule(filtered0, s, tk, catalog)
    }

    val projected =
      if (model.groupBy.isEmpty && model.tumbling.isEmpty && model.hopping.isEmpty) {
        if (model.select.nonEmpty) filtered.select(model.select: _*) else filtered
      } else {
        val keyCols = model.groupByNames.zip(model.groupBy).map { case (n, c) => c.as(n) }
        val windowCol: Seq[Column] = (model.tumbling, model.hopping) match {
          case (Some(t), _) =>
            Seq(windowFor(col(model.timeKey.get), soleTimeframe(t)).as("window"))
          case (_, Some(h)) =>
            Seq(
              window(
                col(model.timeKey.get),
                s"${h.size.toSeconds} seconds",
                s"${h.advanceBy.toSeconds} seconds"
              ).as("window")
            )
          case _ => Nil
        }
        val grouped = filtered.groupBy((windowCol ++ keyCols): _*)
        val agged = grouped.agg(model.select.head, model.select.tail: _*)
        val flat =
          if (windowCol.nonEmpty)
            agged
              .withColumn("window_start", col("window.start"))
              .withColumn("window_end", col("window.end"))
              .drop("window")
          else agged
        model.having.fold(flat)(flat.filter)
      }

    val ordered =
      if (model.orderBy.nonEmpty) projected.orderBy(model.orderBy: _*) else projected
    model.limit.fold(ordered)(ordered.limit)
  }

  /** Streaming (push-query) lowering: same clause pipeline over
    * streaming sources, with the entity's grace period becoming the
    * watermark. Output mode is decided by [[outputMode]].
    */
  def streaming(model: QueryModel, catalog: String => DataFrame): DataFrame = {
    if (model.orderBy.nonEmpty || model.limit.nonEmpty)
      // push-query ORDER BY/LIMIT is dropped with a warning, matching the
      // reference (`DMLQueryGenerator.cs:508-512` warns; ksqlDB ignores) —
      // Structured Streaming cannot sort an unbounded stream
      System.err.println(
        "[graft] WARN: ORDER BY/LIMIT on a push (streaming) query is ignored"
      )
    val base = sourceWithJoin(model, catalog, streaming = true)
    val filtered0 = model.wheres.foldLeft(base)(_.filter(_))
    val filtered = model.schedule.fold(filtered0) { s =>
      val tk = model.timeKey.getOrElse(
        throw new IllegalStateException("TimeFrame requires an entity time key")
      )
      applySchedule(filtered0, s, tk, catalog)
    }
    if (!model.isAggregateQuery) {
      if (model.select.nonEmpty) filtered.select(model.select: _*) else filtered
    } else {
      val graceExpr = model.tumbling
        .map(t => s"${t.grace.toSeconds} seconds")
        .orElse(model.hopping.flatMap(_.grace).map(g => s"${g.toSeconds} seconds"))
        .getOrElse("0 seconds")
      val withWm = model.timeKey.fold(filtered)(tk => filtered.withWatermark(tk, graceExpr))
      val keyCols = model.groupByNames.zip(model.groupBy).map { case (n, c) => c.as(n) }
      val windowCol: Seq[Column] = (model.tumbling, model.hopping) match {
        case (Some(t), _) =>
          Seq(windowFor(col(model.timeKey.get), soleTimeframe(t)).as("window"))
        case (_, Some(h)) =>
          Seq(
            window(
              col(model.timeKey.get),
              s"${h.size.toSeconds} seconds",
              s"${h.advanceBy.toSeconds} seconds"
            ).as("window")
          )
        case _ => Nil
      }
      val agged = withWm
        .groupBy((windowCol ++ keyCols): _*)
        .agg(model.select.head, model.select.tail: _*)
      model.having.fold(agged)(agged.filter)
    }
  }

  /** EMIT CHANGES ≈ update mode; EMIT FINAL ≈ append + watermark-closed
    * windows (`RoleTraits`,
    * `/root/reference/src/Query/Builders/Core/RoleTraits.cs:7-21`).
    */
  def outputMode(model: QueryModel, emitFinal: Boolean = false): String =
    if (!model.isAggregateQuery) "append"
    else if (emitFinal) "append"
    else "update"

  /** Calendar-aware window key: fixed periods use Spark's `window()`;
    * weeks get a `startTime` offset (Spark's window origin is the epoch,
    * 1970-01-01, a THURSDAY — an unshifted 7-day window is
    * Thursday-anchored, not the reference's configurable week anchor,
    * `Periods.cs:16-19`); months (no fixed length) use `date_trunc`.
    */
  def windowFor(ts: Column, p: Period): Column = p match {
    case Period.Weeks(n, anchor) =>
      // Align the window grid with Periods.floorUtc: its base is the
      // first `anchor` day ON/BEFORE 1970-01-05 (Monday), i.e.
      // (4 - back) days from the epoch where `back` walks from Monday to
      // the anchor. For n=1 any week boundary is aligned and this
      // reduces to the first-anchor-after-epoch shift; for n>1 the
      // modulus must be the full n·7-day span or the grid lands a week
      // off for most anchors.
      val back = ((java.time.DayOfWeek.MONDAY.getValue - anchor.getValue) % 7 + 7) % 7
      val span = n * 7
      val offsetDays = (((4 - back) % span) + span) % span
      window(ts, s"$span days", s"$span days", s"$offsetDays days")
    case Period.Months(1) =>
      struct(
        date_trunc("month", ts).as("start"),
        (date_trunc("month", ts) + expr("INTERVAL 1 MONTH")).as("end")
      )
    case Period.Months(n) =>
      // epoch-anchored n-month floor, the column form of Periods.floorUtc
      // (core/Period.scala): months-since-epoch, floored to a multiple of
      // n, rebuilt via add_months from 1970-01-01 (pmod keeps pre-epoch
      // timestamps correct). Reference emits SIZE n MONTHS
      // (KsqlCreateWindowedStatementBuilder.cs:132).
      val monthsSinceEpoch = (year(ts) - lit(1970)) * 12 + month(ts) - 1
      val floored = monthsSinceEpoch - pmod(monthsSinceEpoch, lit(n))
      val start = add_months(lit("1970-01-01").cast("date"), floored).cast("timestamp")
      struct(start.as("start"), add_months(start, n).cast("timestamp").as("end"))
    case other => window(ts, s"${other.fixedSeconds.get} seconds")
  }

  private def sourceWithJoin(
      model: QueryModel,
      catalog: String => DataFrame,
      streaming: Boolean
  ): DataFrame = {
    val left = catalog(model.source.name).alias(model.source.name)
    model.join match {
      case None => left
      case Some(j) =>
        val right = catalog(j.right.name).alias(j.right.name)
        val streamStream =
          model.source.tableType == StreamTableType.Stream &&
            j.right.tableType == StreamTableType.Stream &&
            model.source.timeKey.isDefined && j.right.timeKey.isDefined
        val cond =
          if (streamStream && !j.forbidDefaultWithin) {
            // WITHIN n SECONDS → symmetric time-range predicate; with
            // watermarks on both sides this is Spark's canonical bounded
            // stream-stream join (state is prunable).
            val w = j.withinSeconds.getOrElse(DefaultWithinSeconds)
            val lts = col(s"${model.source.name}.${model.source.timeKey.get}")
            val rts = col(s"${j.right.name}.${j.right.timeKey.get}")
            j.condition &&
            rts >= lts - expr(s"INTERVAL $w SECONDS") &&
            rts <= lts + expr(s"INTERVAL $w SECONDS")
          } else j.condition
        val graceExpr =
          s"${j.graceSeconds.getOrElse(DefaultJoinGraceSeconds)} seconds"
        val l =
          if (streaming && streamStream)
            left.withWatermark(model.source.timeKey.get, graceExpr)
          else left
        val r =
          if (streaming && streamStream)
            right.withWatermark(j.right.timeKey.get, graceExpr)
          else right
        l.join(r, cond, j.joinType)
    }
  }

  /** TimeFrame/session filter: broadcast the (small) schedule table and
    * range-filter on open/close — the Spark shape of the reference's
    * `MarketScheduleProvider.IsInSession`
    * (`/root/reference/src/Runtime/Heartbeat/MarketScheduleProvider.cs:20-45`).
    */
  private def applySchedule(
      df: DataFrame,
      s: ScheduleSpec,
      timeKey: String,
      catalog: String => DataFrame
  ): DataFrame = {
    val sched = catalog(s.schedule.name).alias("__sched")
    val eq = s.joinKeys
      .map { case (f, sc) => df(f) === sched(sc) }
      .reduce(_ && _)
    val ts = df(timeKey)
    val openB =
      if (s.openInclusive) sched(s.openCol) <= ts else sched(s.openCol) < ts
    val closeB =
      if (s.closeInclusive) ts <= sched(s.closeCol) else ts < sched(s.closeCol)
    df.join(broadcast(sched), eq && openB && closeB, "left_semi")
  }
}
