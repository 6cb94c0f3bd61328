package graft

import graft.core.Period
import graft.dsl.Ksql
import graft.sources.TestEntities
import graft.streaming.{BarCascade, GapFill}
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

import java.nio.file.Files
import java.sql.Timestamp
import scala.concurrent.duration._

/** End-to-end flagship path: DSL Tumbling(continuation) model →
  * derivation plan → running hub/live/fill streaming queries.
  */
class CascadeIntegrationSpec extends SparkSpec {
  import spark.implicits._

  private def t(s: String) = Timestamp.valueOf(s)

  test("DSL model drives hub + live + gap-fill cascade end-to-end") {
    implicit val sqlCtx = spark.sqlContext
    val root = Files.createTempDirectory("cascade-e2e").toString

    val model = Ksql
      .from(TestEntities.events)
      .tumbling(Seq(Period.Minutes(1)), grace = 2.seconds, continuation = true)
      .groupBy("event_type" -> col("event_type"))
      .select(count(lit(1)).as("cnt"))
      .build()

    val mem = MemoryStream[Tick]
    val plan = BarCascade.startFromModel(
      spark, mem.toDF(), "bar", Seq("broker", "symbol"),
      "ts", "bid", "seq", model, root, GapFill.CarryForward)
    try {
      assert(plan.livePaths.keySet == Set("1m"))
      assert(plan.fillPaths.keySet == Set("1m"))
      assert(plan.queries.size == 3) // hub, live 1m, fill 1m

      mem.addData(
        Tick("b", "X", t("2024-01-01 00:00:10"), 10.0, 1),
        Tick("b", "X", t("2024-01-01 00:00:30"), 12.0, 2),
        // minute 1 and 2 are EMPTY -> fill should synthesize them
        Tick("b", "X", t("2024-01-01 00:03:20"), 9.0, 3),
        Tick("b", "X", t("2024-01-01 00:30:00"), 1.0, 4) // watermark push
      )
      // let each stage of the chain drain into the next a few times
      (1 to 4).foreach { i =>
        plan.queries.foreach(_.processAllAvailable())
        mem.addData(Tick("b", "X", t(s"2024-01-01 01:0$i:00"), 1.0, 10L + i))
      }
      plan.queries.foreach(_.processAllAvailable())

      val live = spark.read.parquet(plan.livePaths("1m"))
      val liveM0 = live.filter($"bucket_start" === t("2024-01-01 00:00:00")).collect()
      assert(liveM0.length == 1)
      assert(liveM0.head.getAs[Double]("open") == 10.0)
      assert(liveM0.head.getAs[Double]("close") == 12.0)

      val fill = spark.read.parquet(plan.fillPaths("1m"))
      val fillRows = fill.filter($"filled" === true)
        .select($"bucket", $"close").as[(Timestamp, Double)].collect().toMap
      assert(fillRows.contains(t("2024-01-01 00:01:00")))
      assert(fillRows.contains(t("2024-01-01 00:02:00")))
      assert(fillRows(t("2024-01-01 00:01:00")) == 12.0) // carried close
      // the composite key is the NUL-joined key parts
      val key = fill.select($"key").as[String].head()
      assert(key == "b\u0000X")
    } finally plan.queries.foreach(_.stop())
  }
}
