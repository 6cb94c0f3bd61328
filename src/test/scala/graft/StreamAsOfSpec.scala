package graft

import graft.streaming.StreamAsOf
import graft.streaming.StreamAsOf.In
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream

import java.sql.Timestamp

/** Streaming as-of join: watermark-sealed point-in-time matches,
  * out-of-order rights, and state eviction of dead right entries.
  */
class StreamAsOfSpec extends SparkSpec {
  import spark.implicits._

  private def t(s: String) = Timestamp.valueOf(s)
  private def quote(key: String, ts: String, v: Double) = In(key, t(ts), 0, 0L, v)
  private def event(key: String, ts: String, seq: Long, v: Double) = In(key, t(ts), 1, seq, v)

  test("events match the latest quote at-or-before their timestamp, once sealed") {
    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[In]
    val out = StreamAsOf(mem.toDF().withWatermark("ts", "0 seconds").as[In])
    val q = out.writeStream.format("memory").queryName("asof_stream")
      .outputMode("append").start()
    try {
      // quotes arrive OUT OF ORDER relative to the events they serve
      mem.addData(
        quote("X", "2024-01-01 00:00:01", 10.0),
        event("X", "2024-01-01 00:00:03", 1L, 100.0), // should match 00:01 quote
        quote("X", "2024-01-01 00:00:02", 11.0),      // later-arriving, earlier-stamped
        event("Y", "2024-01-01 00:00:02", 2L, 200.0)  // no quote for Y -> nulls
      )
      q.processAllAvailable()
      // watermark is still at batch-start (0) -> nothing sealed yet
      mem.addData(quote("X", "2024-01-01 00:01:00", 12.0)) // advances watermark past 00:03
      q.processAllAvailable()
      mem.addData(quote("X", "2024-01-01 00:02:00", 13.0)) // one more advance to flush
      q.processAllAvailable()

      val rows = spark.table("asof_stream").orderBy("seq").collect()
      assert(rows.length == 2)
      // event 1: the 00:02 quote (11.0) arrived late but BEFORE sealing —
      // as-of picks it over the 00:01 quote
      assert(rows(0).getAs[Double]("right_value") == 11.0)
      assert(rows(0).getAs[Timestamp]("right_ts") == t("2024-01-01 00:00:02"))
      assert(rows(0).getAs[Double]("left_value") == 100.0)
      // event 2 (key Y): no quote ever -> null match, row still emitted
      assert(Option(rows(1).getAs[Any]("right_value")).isEmpty)
    } finally q.stop()
  }

  test("a silent key's pending events are sealed by other keys advancing the watermark") {
    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[In]
    val out = StreamAsOf(mem.toDF().withWatermark("ts", "0 seconds").as[In])
    val q = out.writeStream.format("memory").queryName("asof_silent")
      .outputMode("append").start()
    try {
      mem.addData(
        quote("A", "2024-01-01 00:00:01", 5.0),
        event("A", "2024-01-01 00:00:02", 1L, 50.0))
      q.processAllAvailable()
      // key A never speaks again; key B pushes the global watermark
      mem.addData(quote("B", "2024-01-01 01:00:00", 1.0))
      q.processAllAvailable()
      mem.addData(quote("B", "2024-01-01 02:00:00", 1.0))
      q.processAllAvailable()
      val rows = spark.table("asof_silent").where("key = 'A'").collect()
      assert(rows.length == 1 && rows(0).getAs[Double]("right_value") == 5.0)
    } finally q.stop()
  }

  test("a rights-only key is pruned every batch — state stays bounded") {
    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[In]
    val ckpt = java.nio.file.Files.createTempDirectory("asof_ckpt").toString
    val out = StreamAsOf(mem.toDF().withWatermark("ts", "0 seconds").as[In])
    val q = out.writeStream.format("memory").queryName("asof_prune")
      .option("checkpointLocation", ckpt).outputMode("append").start()
    try {
      // 30 right-side updates for key R, one per batch, never a left —
      // each batch advances the watermark, so eviction must happen in
      // handleInputRows (no pending left ever arms a timer for R)
      (1 to 30).foreach { i =>
        mem.addData(quote("R", f"2024-01-01 00:00:$i%02d", i.toDouble))
        q.processAllAvailable()
      }
    } finally q.stop()
    // read the operator's "rights" map state back from the checkpoint:
    // bounded = carry (latest right <= wm) + rights above the watermark,
    // NOT one entry per update ever received
    val state = spark.read
      .format("statestore")
      .option("path", ckpt)
      .option("stateVarName", "rights")
      .load()
    val n = state.count()
    assert(n <= 3, s"rights-only key retains $n state entries after 30 updates — leak")
  }
}
