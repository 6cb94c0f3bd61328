package graft

import graft.core.Period
import graft.dsl.Ksql
import graft.sources.TestEntities
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

import java.sql.Timestamp

/** Streaming calendar-month windows: months have no fixed length, so the
  * planner keys them with a `date_trunc`-derived struct instead of
  * Spark's `window()` — that column carries no event-time marker, which
  * means UPDATE mode (EMIT CHANGES) refines correctly but APPEND mode
  * (EMIT FINAL) cannot seal and is rejected at query start. The
  * restriction is documented in README; the sealed-output alternative is
  * the cascade (daily append windows → batch month rollup), exactly the
  * `BarCascade` hub → derived pattern.
  */
class StreamingCalendarSpec extends SparkSpec {
  import spark.implicits._

  private def t(s: String) = Timestamp.valueOf(s)

  private def monthlyModel = Ksql
    .from(TestEntities.events)
    .tumbling(Seq(Period.Months(1)))
    .groupBy("event_type" -> col("event_type"))
    .select(count(lit(1)).as("cnt"))
    .build()

  test("streaming monthly windows refine in update mode (EMIT CHANGES)") {
    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[(Long, Timestamp, String, Double)]
    val src = mem.toDF().toDF("event_id", "ts", "event_type", "value")
    val df = graft.plans.Planner.streaming(monthlyModel, _ => src)
    val q = df.writeStream.format("memory").queryName("monthly_stream")
      .outputMode("update").start()
    try {
      mem.addData(
        (1L, t("2024-01-05 00:00:00"), "buy", 1.0),
        (2L, t("2024-01-20 00:00:00"), "buy", 1.0),
        (3L, t("2024-02-02 00:00:00"), "buy", 1.0)
      )
      q.processAllAvailable()
      // a late-arriving January event refines the January bucket
      mem.addData((4L, t("2024-01-28 00:00:00"), "buy", 1.0))
      q.processAllAvailable()

      // update-mode memory sink appends refinements: take latest per window
      val rows = spark.table("monthly_stream")
        .groupBy($"window.start".as("start"))
        .agg(max($"cnt").as("cnt"))
        .orderBy($"start")
        .as[(Timestamp, Long)]
        .collect()
        .toSeq
      assert(rows == Seq(
        (t("2024-01-01 00:00:00"), 3L),
        (t("2024-02-01 00:00:00"), 1L)
      ))
    } finally q.stop()
  }

  test("streaming monthly windows reject append mode with a watermark error") {
    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[(Long, Timestamp, String, Double)]
    val src = mem.toDF().toDF("event_id", "ts", "event_type", "value")
    val df = graft.plans.Planner.streaming(monthlyModel, _ => src)
    val e = intercept[org.apache.spark.sql.AnalysisException] {
      df.writeStream.format("memory").queryName("monthly_append")
        .outputMode("append").start()
    }
    // Spark's unsupported-operation check: append needs a watermark-
    // sealable (event-time) grouping column, which date_trunc is not
    assert(e.getMessage.toLowerCase.contains("append") ||
      e.getMessage.toLowerCase.contains("watermark"))
  }
}
