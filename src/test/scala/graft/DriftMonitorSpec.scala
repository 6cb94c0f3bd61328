package graft

import graft.streaming.DriftMonitor
import org.apache.spark.sql.functions._

/** Streaming PSI drift monitor: in-distribution batches stay quiet,
  * shifted batches alert, replays no-op.
  */
class DriftMonitorSpec extends SparkSpec {
  import spark.implicits._

  private val edges = Seq(10.0, 20.0, 40.0)

  // reference: values spread across bins 0..3
  private def refValues: Seq[Double] =
    (0 until 400).map(i => (i % 50).toDouble)

  test("in-distribution batch stays quiet; shifted batch alerts; replay no-ops") {
    val root = java.nio.file.Files.createTempDirectory("graft_drift").toString
    val refDir = s"$root/ref"
    val monDir = s"$root/mon"
    DriftMonitor.seedReference(refValues.toDF("v"), "v", edges, refDir)

    implicit val sqlCtx = spark.sqlContext
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    val mem = MemoryStream[Double]
    val q = DriftMonitor.attach(
      mem.toDF().toDF("v"), "v", edges, refDir, monDir,
      threshold = 0.25, checkpointLocation = Some(s"$root/chk"))
    try {
      // batch 0: same generator as the reference → tiny PSI
      mem.addData(refValues: _*)
      q.processAllAvailable()
      // batch 1: everything lands in the top bin → large PSI
      mem.addData((0 until 400).map(_ => 99.0): _*)
      q.processAllAvailable()
    } finally q.stop()

    val rows = spark.read.parquet(monDir)
      .orderBy(col(DriftMonitor.BatchCol))
      .collect()
    assert(rows.length == 2, s"one monitor row per batch — got ${rows.toSeq}")
    assert(!rows(0).getAs[Boolean]("alert"),
      s"in-distribution batch alerted: psi=${rows(0).getAs[Double]("psi")}")
    assert(rows(1).getAs[Boolean]("alert"),
      s"shifted batch missed: psi=${rows(1).getAs[Double]("psi")}")
    assert(rows(1).getAs[Double]("psi") > rows(0).getAs[Double]("psi"))

    // replay: same batch id re-offered directly → no new row
    DriftMonitor.scoreBatch(spark, refValues.toDF("v"), "v", edges,
      refDir, monDir, batchId = Some(rows(0).getAs[Long](DriftMonitor.BatchCol)))
    assert(spark.read.parquet(monDir).count() == 2, "replay appended a row")
  }
}
