package graft

import graft.streaming.GapFill
import graft.streaming.GapFill._
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream

import java.sql.Timestamp

/** Gap fill (continuation) — inline gaps, policies, and timer-driven
  * fills for silent keys (the heartbeat path).
  */
class GapFillSpec extends SparkSpec {
  import spark.implicits._

  private def t(s: String) = Timestamp.valueOf(s)
  private def bar(key: String, ts: String, v: Double) =
    BarIn(key, t(ts), v, v, v, v)

  test("inline gaps are carry-forward filled in batch mode") {
    val bars = Seq(
      bar("X", "2024-01-01 00:00:00", 10.0),
      bar("X", "2024-01-01 00:03:00", 12.0) // 2 missing 1m buckets
    ).toDS()
    // batch flatMapGroupsWithState exercises the same transition
    val out = GapFill(bars, periodSec = 60, CarryForward).collect().sortBy(_.bucket.getTime)
    assert(out.length == 4)
    assert(out.map(_.filled).toSeq == Seq(false, true, true, false))
    assert(out(1).close == 10.0 && out(2).close == 10.0) // carried close
    assert(out(1).bucket == t("2024-01-01 00:01:00"))
    assert(out(2).bucket == t("2024-01-01 00:02:00"))
  }

  test("skip policy emits no synthetic bars; sentinel emits the sentinel") {
    val bars = Seq(
      bar("X", "2024-01-01 00:00:00", 10.0),
      bar("X", "2024-01-01 00:02:00", 12.0)
    ).toDS()
    assert(GapFill(bars, 60, Skip).collect().count(_.filled) == 0)
    val sent = GapFill(bars, 60, Sentinel(-1.0)).collect().filter(_.filled)
    assert(sent.length == 1 && sent.head.close == -1.0)
  }

  test("event-time timer fills silent keys once the watermark advances") {
    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[BarIn]
    val filled = GapFill(
      mem.toDF().withWatermark("bucket", "0 seconds").as[BarIn],
      periodSec = 60,
      CarryForward
    )
    val q = filled.writeStream
      .format("memory")
      .queryName("gapfill")
      .outputMode("append")
      .start()
    try {
      mem.addData(bar("X", "2024-01-01 00:00:00", 10.0))
      q.processAllAvailable()
      // another key's bars push the global watermark far past X's next
      // bucket; X is silent -> its timer fires and emits a fill
      mem.addData(bar("Y", "2024-01-01 00:30:00", 5.0))
      q.processAllAvailable()
      mem.addData(bar("Y", "2024-01-01 00:31:00", 6.0))
      q.processAllAvailable()

      val xFills = spark.table("gapfill").as[BarOut].collect()
        .filter(r => r.key == "X" && r.filled)
      assert(xFills.nonEmpty)
      assert(xFills.head.bucket == t("2024-01-01 00:01:00"))
      assert(xFills.head.close == 10.0)
    } finally q.stop()
  }
}
