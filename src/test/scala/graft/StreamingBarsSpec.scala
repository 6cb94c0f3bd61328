package graft

import graft.core.Period
import graft.streaming.{BarCascade, TimeBucket}
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

import java.nio.file.Files
import java.sql.Timestamp

case class Tick(broker: String, symbol: String, ts: Timestamp, bid: Double, seq: Long)

/** Structured-Streaming OHLC cascade: MemoryStream ticks → 1s hub bars →
  * 1m live bars chained through parquet sinks, mirroring the golden
  * cascade semantics (`bars_5m_live.sql`: earliest/latest_by_offset +
  * max/min per tumbling window).
  */
class StreamingBarsSpec extends SparkSpec {
  import spark.implicits._

  private def t(s: String) = Timestamp.valueOf(s)

  test("1s hub bars aggregate OHLC correctly in streaming append mode") {
    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[Tick]
    val bars = BarCascade.hubBars(
      mem.toDF(), Seq("broker", "symbol"), "ts", "bid", "seq")

    val q = bars.writeStream
      .format("memory")
      .queryName("bars1s")
      .outputMode("append")
      .start()
    try {
      mem.addData(
        Tick("b", "X", t("2024-01-01 00:00:00.100"), 10.0, 1),
        Tick("b", "X", t("2024-01-01 00:00:00.400"), 12.0, 2),
        Tick("b", "X", t("2024-01-01 00:00:00.900"), 8.0, 3),
        Tick("b", "X", t("2024-01-01 00:00:01.200"), 11.0, 4)
      )
      q.processAllAvailable()
      // advance watermark past the first second to seal its window
      mem.addData(Tick("b", "X", t("2024-01-01 00:00:20.000"), 9.0, 5))
      q.processAllAvailable()

      val rows = spark.table("bars1s").collect()
      assert(rows.length >= 1)
      val first = spark.table("bars1s")
        .filter(col("bucket_start") === t("2024-01-01 00:00:00"))
        .collect()
      assert(first.length == 1)
      val r = first.head
      assert(r.getAs[Double]("open") == 10.0)   // earliest by seq
      assert(r.getAs[Double]("high") == 12.0)
      assert(r.getAs[Double]("low") == 8.0)
      assert(r.getAs[Double]("close") == 8.0)   // latest by seq
      assert(r.getAs[Long]("cnt") == 3)
    } finally q.stop()
  }

  test("weekly timeframe bars anchor to the configured week day, not the epoch Thursday") {
    // 2024-01-03 is a Wednesday; a bare 7-day window would bucket it to
    // Thursday 2023-12-28, the Monday-anchored grid to 2024-01-01
    val finer = Seq(
      ("b", "X", t("2024-01-03 10:00:00"), 10.0, 14.0, 9.0, 12.0, 5L),
      ("b", "X", t("2024-01-04 10:00:00"), 12.0, 15.0, 11.0, 13.0, 3L)
    ).toDF("broker", "symbol", "bucket_start", "open", "high", "low", "close", "cnt")
    val weekly = BarCascade.timeframeBars(finer, Seq("broker", "symbol"), Period.Weeks(1))
      .collect()
    assert(weekly.length == 1)
    assert(weekly.head.getAs[Timestamp]("bucket_start") == t("2024-01-01 00:00:00"))
    assert(weekly.head.getAs[Double]("open") == 10.0)
    assert(weekly.head.getAs[Double]("close") == 13.0)
    assert(weekly.head.getAs[Long]("cnt") == 8L)
    // months have no fixed length → batch-only, cascade refuses
    intercept[IllegalArgumentException] {
      BarCascade.timeframeBars(finer, Seq("broker", "symbol"), Period.Months(1))
    }
  }

  test("full cascade: ticks → 1s rows sink → 1m live sink; TimeBucket reads") {
    implicit val sqlCtx = spark.sqlContext
    val root = Files.createTempDirectory("cascade").toString
    val mem = MemoryStream[Tick]
    val plan = BarCascade.start(
      spark, mem.toDF(), "bar", Seq("broker", "symbol"),
      "ts", "bid", "seq", Seq(Period.Minutes(1)), root)
    try {
      mem.addData(
        Tick("b", "X", t("2024-01-01 00:00:10"), 10.0, 1),
        Tick("b", "X", t("2024-01-01 00:00:40"), 14.0, 2),
        Tick("b", "X", t("2024-01-01 00:01:30"), 9.0, 3),
        // sentinel far ahead: seals both the 1s and 1m windows
        Tick("b", "X", t("2024-01-01 00:10:00"), 1.0, 4)
      )
      plan.queries.foreach(_.processAllAvailable())
      // second pass so downstream sees the files the hub just wrote
      mem.addData(Tick("b", "X", t("2024-01-01 00:20:00"), 1.0, 5))
      plan.queries.foreach(_.processAllAvailable())

      val live1m = TimeBucket.get(spark, plan, Period.Minutes(1))
        .filter(col("bucket_start") === t("2024-01-01 00:00:00"))
        .collect()
      assert(live1m.length == 1)
      val r = live1m.head
      assert(r.getAs[Double]("open") == 10.0)
      assert(r.getAs[Double]("high") == 14.0)
      assert(r.getAs[Double]("low") == 10.0)
      assert(r.getAs[Double]("close") == 14.0)
      assert(r.getAs[Long]("cnt") == 2)

      intercept[IllegalArgumentException](TimeBucket.get(spark, plan, Period.Seconds(1)))
      intercept[IllegalArgumentException](TimeBucket.get(spark, plan, Period.Hours(2)))
    } finally plan.queries.foreach(_.stop())
  }
}
