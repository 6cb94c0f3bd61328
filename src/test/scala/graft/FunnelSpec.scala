package graft

import graft.operators.Funnel
import org.apache.spark.sql.functions._
import java.sql.Timestamp

/** Hand-computed funnel/retention semantics: greedy earliest-chain,
  * strictly-after ordering, horizon cuts, broken chains, week cohorts.
  */
class FunnelSpec extends SparkSpec {
  import spark.implicits._

  private def ts(day: Int, hour: Int = 0): Timestamp =
    Timestamp.valueOf(f"2024-01-$day%02d $hour%02d:00:00")

  test("funnel is greedy from the EARLIEST step-1 event; chain breaks stay null") {
    val events = Seq(
      // u1 completes: view d1 < click d2 < buy d3
      (1L, "view", ts(1)), (1L, "click", ts(2)), (1L, "buy", ts(3)),
      // u2: click BEFORE its first view → chain breaks at stage 1
      (2L, "click", ts(1)), (2L, "view", ts(2)),
      // u3: greedy — earliest view d5; the d4 click precedes it and the
      // only buy (d6) precedes the d7 click, so u3 reaches stage 2 only
      (3L, "click", ts(4)), (3L, "view", ts(5)), (3L, "buy", ts(6)),
      (3L, "click", ts(7))
    ).toDF("user_id", "event_type", "ts")
    val out = Funnel
      .conversion(events, "user_id", "event_type", "ts",
        steps = Seq("view", "click", "buy"))
      .orderBy("user_id")
      .collect()
    assert(out.map(_.getAs[Int]("stage_reached")).toSeq == Seq(3, 1, 2))
    assert(out(1).getAs[Timestamp]("t_click") == null)
    assert(out(2).getAs[Timestamp]("t_click") == ts(7))
    assert(out(2).getAs[Timestamp]("t_buy") == null)
  }

  test("horizon cuts count from the FIRST step's time") {
    val events = Seq(
      (1L, "view", ts(1)), (1L, "click", ts(2)), (1L, "buy", ts(9)),
      (2L, "view", ts(1)), (2L, "click", ts(8, 23)) // beyond 7 days
    ).toDF("user_id", "event_type", "ts")
    val out = Funnel
      .conversion(events, "user_id", "event_type", "ts",
        steps = Seq("view", "click", "buy"),
        horizon = Some(expr("INTERVAL 7 DAYS")))
      .orderBy("user_id")
      .collect()
    // u1: buy at d9 is past d1+7d → stage 2; u2: click past horizon → 1
    assert(out.map(_.getAs[Int]("stage_reached")).toSeq == Seq(2, 1))
  }

  test("weekly retention counts distinct active users per offset") {
    // weeks: 2024-01-01 (Mon) and 2024-01-08
    val events = Seq(
      (1L, ts(1)), (1L, ts(2)), (1L, ts(8)), // cohort w0, active w0+w1
      (2L, ts(3)),                           // cohort w0, w0 only
      (3L, ts(9))                            // cohort w1
    ).toDF("user_id", "ts")
    val out = Funnel
      .weeklyRetention(events, "user_id", "ts")
      .orderBy("cohort_week", "week_offset")
      .collect()
      .map(r => (r.getAs[java.sql.Date]("cohort_week").toString,
        r.getAs[Int]("week_offset"), r.getAs[Long]("n_active"),
        r.getAs[Long]("n_cohort"), r.getAs[Double]("retention")))
    assert(out.toSeq == Seq(
      ("2024-01-01", 0, 2L, 2L, 1.0),
      ("2024-01-01", 1, 1L, 2L, 0.5),
      ("2024-01-08", 0, 1L, 1L, 1.0)))
  }
}
