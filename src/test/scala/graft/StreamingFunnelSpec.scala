package graft

import graft.operators.Funnel
import graft.streaming.StreamingFunnel
import graft.streaming.StreamingFunnel.In
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

import java.sql.Timestamp

/** Streaming funnel: watermark-sealed in-order replay makes the live
  * operator agree with the batch greedy funnel on equal inputs, with
  * out-of-order arrival and cross-batch chains.
  */
class StreamingFunnelSpec extends SparkSpec {
  import spark.implicits._

  private val steps = Seq("view", "click", "buy")
  private def t(s: String) = Timestamp.valueOf(s)

  private def in(user: Long, ts: String, step: Int, seq: Long) =
    In(user, t(ts), step, seq)

  test("stage advances match the batch funnel, including out-of-order arrivals") {
    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[In]
    // 1 h allowed lateness: the cross-batch out-of-order arrivals below
    // are INSIDE it (a 0 s watermark would drop them as late data —
    // correct streaming semantics, but not what this test exercises)
    val out = StreamingFunnel(
      mem.toDF().withWatermark("ts", "1 hour").as[In], numSteps = 3)
    val q = out.writeStream.format("memory").queryName("funnel_stream")
      .outputMode("append").start()
    // u1 completes cleanly; u2's click ARRIVES before its view but is
    // STAMPED after it (out-of-order delivery, in-order event time);
    // u3's buy precedes its click in event time → stage 2 only
    val events = Seq(
      (1L, "2024-01-01 00:00:01", 0, 1L),
      (1L, "2024-01-01 00:00:02", 1, 2L),
      (1L, "2024-01-01 00:00:03", 2, 3L),
      (2L, "2024-01-01 00:00:05", 1, 4L), // click, stamped after the view below
      (2L, "2024-01-01 00:00:04", 0, 5L), // view, arrives later
      (3L, "2024-01-01 00:00:01", 0, 6L),
      (3L, "2024-01-01 00:00:02", 2, 7L), // buy before any click
      (3L, "2024-01-01 00:00:06", 1, 8L)
    )
    try {
      mem.addData(events.take(4).map { case (u, ts, s, q_) => in(u, ts, s, q_) }: _*)
      q.processAllAvailable()
      mem.addData(events.drop(4).map { case (u, ts, s, q_) => in(u, ts, s, q_) }: _*)
      q.processAllAvailable()
      // flush: far-future event advances the watermark past everything
      mem.addData(in(999L, "2024-01-02 00:00:00", 0, 99L))
      q.processAllAvailable()
      mem.addData(in(999L, "2024-01-03 00:00:00", 1, 100L))
      q.processAllAvailable()

      val streamed = spark.table("funnel_stream")
        .where("user < 999")
        .groupBy("user").agg(max("stage_reached").as("stage"))
        .collect().map(r => r.getLong(0) -> r.getInt(1)).toMap

      val batch = Funnel
        .conversion(
          events.map { case (u, ts, s, _) => (u, steps(s), t(ts)) }
            .toDF("user_id", "event_type", "ts"),
          "user_id", "event_type", "ts", steps)
        .collect().map(r => r.getLong(0) -> r.getAs[Int]("stage_reached")).toMap

      assert(streamed == batch, s"streamed=$streamed batch=$batch")
      assert(streamed == Map(1L -> 3, 2L -> 2, 3L -> 2))

      // per-advance rows carry the stage timestamps the batch op reports
      val u1 = spark.table("funnel_stream").where("user = 1")
        .orderBy("stage_reached")
        .collect().map(_.getAs[Timestamp]("stage_ts"))
      assert(u1.toSeq == Seq(t("2024-01-01 00:00:01"),
        t("2024-01-01 00:00:02"), t("2024-01-01 00:00:03")))
    } finally q.stop()
  }

  test("late events (beyond the watermark delay) are dropped, matching batch over on-time inputs") {
    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[In]
    val out = StreamingFunnel(
      mem.toDF().withWatermark("ts", "0 seconds").as[In], numSteps = 2)
    val q = out.writeStream.format("memory").queryName("funnel_late")
      .outputMode("append").start()
    try {
      mem.addData(in(1L, "2024-01-01 00:00:05", 1, 1L)) // click first
      q.processAllAvailable() // watermark → 00:00:05
      mem.addData(in(1L, "2024-01-01 00:00:04", 0, 2L)) // view now LATE
      q.processAllAvailable()
      mem.addData(in(999L, "2024-01-02 00:00:00", 0, 9L))
      q.processAllAvailable()
      // the effective on-time input is {click} → no stage-1, no rows
      assert(spark.table("funnel_late").where("user = 1").count() == 0)
    } finally q.stop()
  }

  test("horizon cuts agree with the batch operator") {
    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[In]
    val out = StreamingFunnel(
      mem.toDF().withWatermark("ts", "0 seconds").as[In],
      numSteps = 2, horizonMs = Some(60000L)) // 1 minute
    val q = out.writeStream.format("memory").queryName("funnel_horizon")
      .outputMode("append").start()
    try {
      mem.addData(
        in(1L, "2024-01-01 00:00:00", 0, 1L),
        in(1L, "2024-01-01 00:00:30", 1, 2L), // inside horizon
        in(2L, "2024-01-01 00:00:00", 0, 3L),
        in(2L, "2024-01-01 00:02:00", 1, 4L)) // past horizon
      q.processAllAvailable()
      mem.addData(in(999L, "2024-01-02 00:00:00", 0, 9L))
      q.processAllAvailable()
      val stages = spark.table("funnel_horizon").where("user < 999")
        .groupBy("user").agg(max("stage_reached").as("s"))
        .collect().map(r => r.getLong(0) -> r.getInt(1)).toMap
      assert(stages == Map(1L -> 2, 2L -> 1), s"got $stages")
    } finally q.stop()
  }
}
