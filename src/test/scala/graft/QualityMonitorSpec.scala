package graft

import graft.operators.Quality
import graft.streaming.QualityMonitor
import org.apache.spark.sql.functions._

/** Streaming per-batch constraint checking: a clean batch passes, a
  * broken one reports the failing constraint, replays no-op.
  */
class QualityMonitorSpec extends SparkSpec {
  import spark.implicits._

  private val constraints = Seq(
    Quality.Complete("text"),
    Quality.InSet("lang", Seq("en", "de")))

  test("per-batch reports flag the failing constraint; replays no-op") {
    val root = java.nio.file.Files.createTempDirectory("graft_qmon").toString
    val monDir = s"$root/mon"

    implicit val sqlCtx = spark.sqlContext
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    val mem = MemoryStream[(Long, String, String)]
    val q = QualityMonitor.attach(
      mem.toDF().toDF("id", "text", "lang"), constraints, monDir,
      checkpointLocation = Some(s"$root/chk"))
    try {
      mem.addData((1L, "good", "en"), (2L, "fine", "de"))
      q.processAllAvailable()
      mem.addData((3L, null, "en"), (4L, "ok", "xx"))
      q.processAllAvailable()
    } finally q.stop()

    val rows = spark.read.parquet(monDir)
      .orderBy(col(QualityMonitor.BatchCol), col("check_name"))
      .collect()
      .map(r => (r.getAs[Long](QualityMonitor.BatchCol),
        r.getString(0), r.getDouble(1), r.getBoolean(2)))
    assert(rows.length == 4, s"2 constraints × 2 batches: ${rows.toSeq}")
    val byBatch = rows.groupBy(_._1)
    assert(byBatch(0L).forall(_._4), s"clean batch must pass: ${byBatch(0L).toSeq}")
    val b1 = byBatch(1L).map(r => r._2 -> ((r._3, r._4))).toMap
    assert(b1("complete_text") == ((0.5, false)))
    assert(b1("set_lang") == ((0.5, false)))

    // replay: batch id 1 re-offered directly → no new rows
    QualityMonitor.scoreBatch(spark,
      Seq((9L, "x", "en")).toDF("id", "text", "lang"),
      constraints, monDir, batchId = Some(1L))
    assert(spark.read.parquet(monDir).count() == 4, "replay appended rows")
  }
}
