package graft.queries

import graft.core.Period
import graft.dsl.{Ksql, ScheduleSpec}
import graft.plans.Planner
import graft.sources.TestEntities._
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType
import org.apache.spark.sql.{DataFrame, SparkSession}

import scala.concurrent.duration._

/** Windowed operators of SURVEY §2.1/§2.6, exercised batch-side for the
  * DuckDB oracle. The streaming forms (watermark + update/append mode)
  * run the same Planner lowering and are covered by ScalaTest specs.
  *
  * The OHLC queries mirror the reference's golden cascade
  * (`tests/Query/Golden/bars_5m_live.sql`: earliest_by_offset(open),
  * max(high), min(low), latest_by_offset(close) over tumbling windows).
  */
object WindowQueries extends QueryPack {

  val defs: Map[String, (SparkSession, String) => DataFrame] = Map(
    // Tumbling window aggregation (5m)
    "q_window_tumbling" -> { (s, dir) =>
      Planner.batch(
        Ksql
          .from(events)
          .tumbling(Seq(Period.Minutes(5)))
          .groupBy("event_type" -> col("event_type"))
          .select(
            count(lit(1)).as("cnt"),
            sum(col("value").cast(DecimalType(18, 2))).cast("double").as("total")
          )
          .build(),
        catalog(s, dir)
      ).orderBy(col("window_start"), col("event_type"))
    },

    // Hopping window (size 10m, advance 5m)
    "q_window_hopping" -> { (s, dir) =>
      Planner.batch(
        Ksql
          .from(events)
          .hopping(10.minutes, 5.minutes)
          .groupBy("event_type" -> col("event_type"))
          .select(count(lit(1)).as("cnt"))
          .build(),
        catalog(s, dir)
      ).orderBy(col("window_start"), col("event_type"))
    },

    // Hopping window with a NON-divisible advance (size 5m, advance 2m) —
    // the reference accepts any SIZE/ADVANCE pair (`KsqlQueryable.cs:100-123`);
    // events near a 2m boundary fall in 3 windows, others in 2
    "q_window_hopping_nondiv" -> { (s, dir) =>
      Planner.batch(
        Ksql
          .from(events)
          .hopping(5.minutes, 2.minutes)
          .groupBy("event_type" -> col("event_type"))
          .select(count(lit(1)).as("cnt"))
          .build(),
        catalog(s, dir)
      ).orderBy(col("window_start"), col("event_type"))
    },

    // 1-second OHLC bars — the RowMonitor hub aggregation
    // (`src/Runtime/RowMonitor.cs:39-50`), batch form
    "q_bars_1s" -> { (s, dir) =>
      Planner.batch(
        Ksql
          .from(events)
          .tumbling(Seq(Period.Seconds(1)))
          .groupBy("event_type" -> col("event_type"))
          .select(
            min_by(col("value"), col("event_id")).as("open"),
            max(col("value")).as("high"),
            min(col("value")).as("low"),
            max_by(col("value"), col("event_id")).as("close"),
            count(lit(1)).as("cnt")
          )
          .build(),
        catalog(s, dir)
      ).orderBy(col("window_start"), col("event_type"))
    },

    // 5m bars re-aggregated FROM the 1s bars — the hub cascade
    // (`DerivedTumblingPipeline.cs:56-87`): open = earliest 1s open,
    // close = latest 1s close, keyed by the 1s bucket start
    "q_bars_5m_cascade" -> { (s, dir) =>
      val bars1s = defs("q_bars_1s")(s, dir)
      bars1s
        .groupBy(
          window(col("window_start"), "5 minutes").getField("start").as("bucket_start"),
          col("event_type")
        )
        .agg(
          min_by(col("open"), col("window_start")).as("open"),
          max(col("high")).as("high"),
          min(col("low")).as("low"),
          max_by(col("close"), col("window_start")).as("close"),
          sum(col("cnt")).as("cnt")
        )
        .orderBy(col("bucket_start"), col("event_type"))
    },

    // Calendar-month tumbling (the window() built-in can't express
    // months — date_trunc grouping, SURVEY §7.4 hazard)
    "q_window_monthly" -> { (s, dir) =>
      Planner.batch(
        Ksql
          .from(events)
          .tumbling(Seq(Period.Months(1)))
          .groupBy("event_type" -> col("event_type"))
          .select(count(lit(1)).as("cnt"))
          .build(),
        catalog(s, dir)
      ).orderBy(col("window_start"), col("event_type"))
    },

    // Multi-week tumbling (SIZE 2 WEEKS, Monday anchor): the window grid
    // must align to the floorUtc base (first anchor on/before
    // 1970-01-05) — this query pins the n>1 alignment end-to-end
    "q_window_biweekly" -> { (s, dir) =>
      Planner.batch(
        Ksql
          .from(events)
          .tumbling(Seq(Period.Weeks(2)))
          .groupBy("event_type" -> col("event_type"))
          .select(count(lit(1)).as("cnt"))
          .build(),
        catalog(s, dir)
      ).orderBy(col("window_start"), col("event_type"))
    },

    // Multi-month tumbling (SIZE 3 MONTHS): epoch-anchored quarter floor
    // via the planner's add_months month-arithmetic (no fixed length)
    "q_window_quarterly" -> { (s, dir) =>
      Planner.batch(
        Ksql
          .from(events)
          .tumbling(Seq(Period.Months(3)))
          .groupBy("event_type" -> col("event_type"))
          .select(count(lit(1)).as("cnt"))
          .build(),
        catalog(s, dir)
      ).orderBy(col("window_start"), col("event_type"))
    },

    // Week windows anchored to Monday (Spark's epoch origin is a
    // Thursday; the planner shifts startTime to the anchor day)
    "q_window_weekly" -> { (s, dir) =>
      Planner.batch(
        Ksql
          .from(events)
          .tumbling(Seq(Period.Weeks(1)))
          .groupBy("event_type" -> col("event_type"))
          .select(count(lit(1)).as("cnt"))
          .build(),
        catalog(s, dir)
      ).orderBy(col("window_start"), col("event_type"))
    },

    // Session windows (gap-based) — BEYOND the reference: its DSL has
    // none (SURVEY §2.1), Spark's session_window is native. A session
    // closes after 30 idle minutes; window_end = last event + gap.
    "q_window_session" -> { (s, dir) =>
      graft.sources.Tables
        .load(s, dir, "events")
        .groupBy(session_window(col("ts"), "30 minutes").as("w"), col("event_type"))
        .agg(count(lit(1)).as("cnt"))
        .select(
          col("w.start").as("window_start"),
          col("w.end").as("window_end"),
          col("event_type"),
          col("cnt")
        )
        .orderBy(col("event_type"), col("window_start"))
    },

    // Stream-stream join with the default WITHIN 300s bound
    // (`KsqlCreateStatementBuilder.cs:362-376`) — the planner injects the
    // symmetric time-range predicate automatically
    "q_join_within" -> { (s, dir) =>
      Planner.batch(
        Ksql
          .from(events)
          .join(
            events2,
            col("events.user_id") === col("events2.user_id") &&
              col("events.event_type") === lit("signup") &&
              col("events2.event_type") === lit("purchase")
          )
          .where(col("events2.ts") >= col("events.ts"))
          .select(
            col("events.event_id").as("signup_id"),
            col("events2.event_id").as("purchase_id"),
            col("events.user_id").as("user_id")
          )
          .orderBy(col("signup_id"), col("purchase_id"))
          .build(),
        catalog(s, dir)
      )
    },

    // Market-schedule session restriction (TimeFrame DSL,
    // `KsqlQueryable.cs:127-184`): only events inside 09:00-17:00 UTC
    // sessions count
    "q_schedule_filter" -> { (s, dir) =>
      Planner.batch(
        Ksql
          .from(events)
          .timeFrame(
            ScheduleSpec(
              schedule = graft.sources.TestEntities.marketScheduleEntity,
              joinKeys = Seq("event_type" -> "event_type"),
              openCol = "open_ts",
              closeCol = "close_ts"
            )
          )
          .groupBy("event_type" -> col("event_type"))
          .select(count(lit(1)).as("in_session_cnt"))
          .orderBy(col("event_type"))
          .build(),
        catalog(s, dir)
      )
    },

    // Gap fill with carry-forward (continuation / bar_1m_fill semantics,
    // golden `bars_1m_fill`): dense 1h grid per event_type, bars
    // left-joined, close carried forward over empty buckets
    "q_gap_fill" -> { (s, dir) =>
      val ev = graft.sources.Tables.load(s, dir, "events")
      val bars = ev
        .groupBy(
          window(col("ts"), "1 hour").getField("start").as("bucket"),
          col("event_type")
        )
        .agg(max_by(col("value"), col("event_id")).as("close"))
      val span = ev
        .groupBy(col("event_type"))
        .agg(
          date_trunc("hour", min(col("ts"))).as("min_b"),
          date_trunc("hour", max(col("ts"))).as("max_b")
        )
      val grid = span.select(
        col("event_type"),
        explode(expr("sequence(min_b, max_b, interval 1 hour)")).as("bucket")
      )
      val w = Window
        .partitionBy(col("event_type"))
        .orderBy(col("bucket"))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      grid
        .join(bars, Seq("event_type", "bucket"), "left_outer")
        .withColumn("filled_close", last(col("close"), ignoreNulls = true).over(w))
        .withColumn("is_gap", col("close").isNull)
        .select(col("event_type"), col("bucket"), col("filled_close"), col("is_gap"))
        .orderBy(col("event_type"), col("bucket"))
    },

    // TimeBucket pull read (`src/Runtime/TimeBucket.cs:18-24` +
    // windowed pull `HoppingWindow.cs:33-76`): read a bar table filtered
    // by WINDOWSTART >= ... with LIMIT
    "q_timebucket_read" -> { (s, dir) =>
      defs("q_bars_1s")(s, dir)
        .filter(
          col("window_start") >= lit("2024-01-15 00:00:00").cast("timestamp") &&
            col("event_type") === "purchase"
        )
        .select(col("window_start"), col("event_type"), col("close"), col("cnt"))
        .orderBy(col("window_start"))
        .limit(200)
    }
  )

  val oracles: Map[String, String] = Map(
    "q_window_tumbling" ->
      """SELECT TIME_BUCKET(INTERVAL '5 minutes', ts) AS window_start,
        |       TIME_BUCKET(INTERVAL '5 minutes', ts) + INTERVAL '5 minutes' AS window_end,
        |       event_type,
        |       COUNT(*) AS cnt,
        |       CAST(SUM(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS total
        |FROM events
        |GROUP BY 1, 2, 3
        |ORDER BY window_start, event_type""".stripMargin,
    "q_window_hopping" ->
      """SELECT TIME_BUCKET(INTERVAL '5 minutes', ts) - k * INTERVAL '5 minutes' AS window_start,
        |       TIME_BUCKET(INTERVAL '5 minutes', ts) - k * INTERVAL '5 minutes' + INTERVAL '10 minutes' AS window_end,
        |       event_type,
        |       COUNT(*) AS cnt
        |FROM events CROSS JOIN (VALUES (0), (1)) t(k)
        |GROUP BY 1, 2, 3
        |ORDER BY window_start, event_type""".stripMargin,
    "q_window_hopping_nondiv" ->
      """SELECT TIME_BUCKET(INTERVAL '2 minutes', ts) - k * INTERVAL '2 minutes' AS window_start,
        |       TIME_BUCKET(INTERVAL '2 minutes', ts) - k * INTERVAL '2 minutes' + INTERVAL '5 minutes' AS window_end,
        |       event_type,
        |       COUNT(*) AS cnt
        |FROM events CROSS JOIN (VALUES (0), (1), (2)) t(k)
        |WHERE TIME_BUCKET(INTERVAL '2 minutes', ts) - k * INTERVAL '2 minutes' + INTERVAL '5 minutes' > ts
        |GROUP BY 1, 2, 3
        |ORDER BY window_start, event_type""".stripMargin,
    "q_bars_1s" ->
      """SELECT TIME_BUCKET(INTERVAL '1 second', ts) AS window_start,
        |       TIME_BUCKET(INTERVAL '1 second', ts) + INTERVAL '1 second' AS window_end,
        |       event_type,
        |       ARG_MIN(value, event_id) AS open,
        |       MAX(value) AS high,
        |       MIN(value) AS low,
        |       ARG_MAX(value, event_id) AS close,
        |       COUNT(*) AS cnt
        |FROM events
        |GROUP BY 1, 2, 3
        |ORDER BY window_start, event_type""".stripMargin,
    "q_bars_5m_cascade" ->
      """WITH b1s AS (
        |  SELECT TIME_BUCKET(INTERVAL '1 second', ts) AS ws,
        |         event_type,
        |         ARG_MIN(value, event_id) AS open,
        |         MAX(value) AS high,
        |         MIN(value) AS low,
        |         ARG_MAX(value, event_id) AS close,
        |         COUNT(*) AS cnt
        |  FROM events GROUP BY 1, 2)
        |SELECT TIME_BUCKET(INTERVAL '5 minutes', ws) AS bucket_start,
        |       event_type,
        |       ARG_MIN(open, ws) AS open,
        |       MAX(high) AS high,
        |       MIN(low) AS low,
        |       ARG_MAX(close, ws) AS close,
        |       CAST(SUM(cnt) AS BIGINT) AS cnt
        |FROM b1s
        |GROUP BY 1, 2
        |ORDER BY bucket_start, event_type""".stripMargin,
    "q_window_monthly" ->
      """SELECT CAST(DATE_TRUNC('month', ts) AS TIMESTAMP) AS window_start,
        |       CAST(DATE_TRUNC('month', ts) AS TIMESTAMP) + INTERVAL 1 MONTH AS window_end,
        |       event_type,
        |       COUNT(*) AS cnt
        |FROM events
        |GROUP BY 1, 2, 3
        |ORDER BY window_start, event_type""".stripMargin,
    // biweekly floor in epoch-day arithmetic: day 4 = 1970-01-05, the
    // Monday floorUtc anchors to; buckets are multiples of 14 days
    "q_window_biweekly" ->
      """SELECT CAST(TO_TIMESTAMP((CAST(FLOOR((EPOCH(ts)/86400.0 - 4) / 14) AS BIGINT) * 14 + 4) * 86400) AS TIMESTAMP) AS window_start,
        |       CAST(TO_TIMESTAMP((CAST(FLOOR((EPOCH(ts)/86400.0 - 4) / 14) AS BIGINT) * 14 + 18) * 86400) AS TIMESTAMP) AS window_end,
        |       event_type,
        |       COUNT(*) AS cnt
        |FROM events
        |GROUP BY 1, 2, 3
        |ORDER BY window_start, event_type""".stripMargin,
    // DuckDB's 'quarter' truncation is Jan-anchored, which coincides with
    // the epoch-anchored 3-month floor (1970-01 mod 3 = 0)
    "q_window_quarterly" ->
      """SELECT CAST(DATE_TRUNC('quarter', ts) AS TIMESTAMP) AS window_start,
        |       CAST(DATE_TRUNC('quarter', ts) AS TIMESTAMP) + INTERVAL 3 MONTH AS window_end,
        |       event_type,
        |       COUNT(*) AS cnt
        |FROM events
        |GROUP BY 1, 2, 3
        |ORDER BY window_start, event_type""".stripMargin,
    "q_window_weekly" ->
      """SELECT CAST(DATE_TRUNC('week', ts) AS TIMESTAMP) AS window_start,
        |       CAST(DATE_TRUNC('week', ts) AS TIMESTAMP) + INTERVAL 7 DAY AS window_end,
        |       event_type,
        |       COUNT(*) AS cnt
        |FROM events
        |GROUP BY 1, 2, 3
        |ORDER BY window_start, event_type""".stripMargin,
    "q_window_session" ->
      """WITH marked AS (
        |  SELECT event_type, ts, event_id,
        |         CASE WHEN LAG(ts) OVER w IS NULL
        |               OR ts - LAG(ts) OVER w >= INTERVAL '30 minutes'
        |              THEN 1 ELSE 0 END AS new_s
        |  FROM events
        |  WINDOW w AS (PARTITION BY event_type ORDER BY ts, event_id)),
        |sess AS (
        |  SELECT event_type, ts,
        |         SUM(new_s) OVER (PARTITION BY event_type ORDER BY ts, event_id
        |                          ROWS UNBOUNDED PRECEDING) AS sid
        |  FROM marked)
        |SELECT MIN(ts) AS window_start,
        |       MAX(ts) + INTERVAL '30 minutes' AS window_end,
        |       event_type,
        |       COUNT(*) AS cnt
        |FROM sess
        |GROUP BY event_type, sid
        |ORDER BY event_type, window_start""".stripMargin,
    "q_join_within" ->
      """SELECT e1.event_id AS signup_id,
        |       e2.event_id AS purchase_id,
        |       e1.user_id AS user_id
        |FROM events e1 JOIN events e2
        |  ON e1.user_id = e2.user_id
        | AND e1.event_type = 'signup' AND e2.event_type = 'purchase'
        | AND e2.ts >= e1.ts - INTERVAL '300 seconds'
        | AND e2.ts <= e1.ts + INTERVAL '300 seconds'
        |WHERE e2.ts >= e1.ts
        |ORDER BY signup_id, purchase_id""".stripMargin,
    "q_schedule_filter" ->
      """WITH sched AS (
        |  SELECT DISTINCT event_type, CAST(ts AS DATE) AS day
        |  FROM events)
        |SELECT e.event_type, COUNT(*) AS in_session_cnt
        |FROM events e
        |WHERE EXISTS (
        |  SELECT 1 FROM sched s
        |  WHERE s.event_type = e.event_type
        |    AND CAST(s.day AS TIMESTAMP) + INTERVAL '9 hours' <= e.ts
        |    AND e.ts < CAST(s.day AS TIMESTAMP) + INTERVAL '17 hours')
        |GROUP BY e.event_type
        |ORDER BY e.event_type""".stripMargin,
    "q_gap_fill" ->
      """WITH bars AS (
        |  SELECT TIME_BUCKET(INTERVAL '1 hour', ts) AS bucket, event_type,
        |         ARG_MAX(value, event_id) AS close
        |  FROM events GROUP BY 1, 2),
        |span AS (
        |  SELECT event_type,
        |         DATE_TRUNC('hour', MIN(ts)) AS min_b,
        |         DATE_TRUNC('hour', MAX(ts)) AS max_b
        |  FROM events GROUP BY 1),
        |grid AS (
        |  SELECT event_type, UNNEST(GENERATE_SERIES(min_b, max_b, INTERVAL '1 hour')) AS bucket
        |  FROM span)
        |SELECT g.event_type, g.bucket,
        |       LAST_VALUE(b.close IGNORE NULLS) OVER (
        |         PARTITION BY g.event_type ORDER BY g.bucket
        |         ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS filled_close,
        |       b.close IS NULL AS is_gap
        |FROM grid g LEFT JOIN bars b
        |  ON g.event_type = b.event_type AND g.bucket = b.bucket
        |ORDER BY g.event_type, g.bucket""".stripMargin,
    "q_timebucket_read" ->
      """SELECT TIME_BUCKET(INTERVAL '1 second', ts) AS window_start,
        |       event_type,
        |       ARG_MAX(value, event_id) AS close,
        |       COUNT(*) AS cnt
        |FROM events
        |WHERE event_type = 'purchase'
        |GROUP BY 1, 2
        |HAVING TIME_BUCKET(INTERVAL '1 second', ts) >= TIMESTAMP '2024-01-15 00:00:00'
        |ORDER BY window_start
        |LIMIT 200""".stripMargin
  )

  private def catalog(s: SparkSession, dir: String) =
    graft.sources.TestEntities.catalog(s, dir)
}
