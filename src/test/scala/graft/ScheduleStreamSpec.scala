package graft

import graft.streaming.MarketSchedule
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

import java.sql.Timestamp
import java.time.Instant

/** TimeFrame/session gating on a LIVE stream: the schedule is the
  * static side of a stream-static join, re-read every micro-batch —
  * which is exactly the reference's periodic schedule refresh.
  */
class ScheduleStreamSpec extends SparkSpec {
  import spark.implicits._

  private def t(s: String) = Timestamp.valueOf(s)

  test("streaming session filter keeps only in-session ticks") {
    implicit val sqlCtx = spark.sqlContext
    val sched = Seq(
      ("X", t("2024-01-01 09:00:00"), t("2024-01-01 17:00:00"))
    ).toDF("symbol", "open_ts", "close_ts")

    val mem = MemoryStream[(String, Timestamp, Double)]
    val ticks = mem.toDF().toDF("symbol", "ts", "bid")
    val gated = MarketSchedule.sessionFilter(
      ticks, sched, Seq("symbol" -> "symbol"), "ts")
    assert(gated.isStreaming)

    val q = gated.writeStream.format("memory").queryName("gated")
      .outputMode("append").start()
    try {
      mem.addData(
        ("X", t("2024-01-01 08:59:59"), 1.0), // pre-open
        ("X", t("2024-01-01 09:00:00"), 2.0), // open boundary (inclusive)
        ("X", t("2024-01-01 12:00:00"), 3.0), // in session
        ("X", t("2024-01-01 17:00:00"), 4.0), // close boundary (exclusive)
        ("Y", t("2024-01-01 12:00:00"), 5.0)  // no schedule row
      )
      q.processAllAvailable()
      val bids = spark.table("gated").select("bid").as[Double].collect().sorted
      assert(bids.toSeq == Seq(2.0, 3.0))
    } finally q.stop()
  }

  test("InMemoryProvider gates row-level with the same boundaries") {
    val p = new MarketSchedule.InMemoryProvider(Map(
      "X" -> Seq((Instant.parse("2024-01-01T09:00:00Z"), Instant.parse("2024-01-01T17:00:00Z")))
    ))
    assert(p.isInSession("X", Instant.parse("2024-01-01T09:00:00Z")))
    assert(p.isInSession("X", Instant.parse("2024-01-01T12:00:00Z")))
    assert(!p.isInSession("X", Instant.parse("2024-01-01T17:00:00Z")))
    assert(!p.isInSession("X", Instant.parse("2024-01-01T08:59:59Z")))
    assert(!p.isInSession("Y", Instant.parse("2024-01-01T12:00:00Z")))
  }
}
