package graft

import graft.core.Period
import graft.streaming.{BarCascade, Supervisor}
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

import java.nio.file.Files
import java.sql.Timestamp

/** CHAOS: kill the whole bar cascade mid-flight, then restart every
  * stage from its checkpoint (through the [[Supervisor]]) and feed the
  * rest. Exactly-once means the sinks must equal an uninterrupted run's
  * sinks EXACTLY: no lost bars (state restored), no duplicated bars
  * (file-sink metadata log). Two kill points cover the cascade's two
  * distinct restart windows:
  *   - hub drained, 1m/5m stages lagging (die between hub and cascade);
  *   - hub AND 1m drained, 5m lagging (die inside the 1m→5m handoff,
  *     where the 5m stage's input is itself a restarted file source).
  */
class CascadeChaosSpec extends SparkSpec {
  import spark.implicits._

  private val base = Timestamp.valueOf("2024-03-01 09:00:00").getTime

  /** Deterministic synthetic feed: 2 symbols, a tick every 400 ms each,
    * ~33 minutes of event time, value path with realistic up/down
    * moves. 10k ticks → ~4k sealed 1s bars, ~66 1m bars, ~12 5m bars.
    */
  private def ticks: IndexedSeq[Tick] =
    (0 until 10000).map { i =>
      val sym = if (i % 2 == 0) "X" else "Y"
      val ts = new Timestamp(base + (i / 2) * 400L)
      Tick("b", sym, ts, 100.0 + (i % 97) * 0.25 - (i % 13), i.toLong)
    }

  private val timeframes = Seq(Period.Minutes(1), Period.Minutes(5))
  private def chunks = ticks.splitAt(4000)

  private def snapshot(plan: BarCascade.CascadePlan): Map[String, Seq[String]] =
    (plan.livePaths + ("hub" -> plan.hubPath)).map { case (label, path) =>
      val df = spark.read.parquet(path)
      label -> df
        .select(df.columns.sorted.map(col): _*)
        .collect()
        .map(_.toString)
        .toSeq
        .sorted
    }

  /** The ground truth: one uninterrupted run, shared by both kill
    * scenarios (deterministic input ⇒ deterministic sinks).
    */
  private lazy val uninterrupted: Map[String, Seq[String]] = {
    implicit val sqlCtx = spark.sqlContext
    val (chunk1, chunk2) = chunks
    val root = Files.createTempDirectory("cascade-a").toString
    val mem = MemoryStream[Tick]
    val plan = BarCascade.start(spark, mem.toDF(), "bar", Seq("broker", "symbol"),
      "ts", "bid", "seq", timeframes, root)
    try {
      mem.addData(chunk1: _*)
      plan.queries.foreach(_.processAllAvailable())
      mem.addData(chunk2: _*)
      plan.queries.foreach(_.processAllAvailable())
      plan.queries.foreach(_.processAllAvailable()) // drain the chain
      snapshot(plan)
    } finally plan.queries.foreach(_.stop())
  }

  /** Kill run: feed chunk1, drain only the first `drainStages` queries
    * (queries are ordered hub, 1m, 5m), abruptly stop every stage, let
    * chunk2 arrive while the cascade is down, then relaunch everything
    * from the same root under a Supervisor and drain.
    */
  private def killAndHeal(drainStages: Int): Map[String, Seq[String]] = {
    implicit val sqlCtx = spark.sqlContext
    val (chunk1, chunk2) = chunks
    val root = Files.createTempDirectory("cascade-b").toString
    val mem = MemoryStream[Tick]
    val plan = BarCascade.start(spark, mem.toDF(), "bar", Seq("broker", "symbol"),
      "ts", "bid", "seq", timeframes, root)
    mem.addData(chunk1: _*)
    plan.queries.take(drainStages).foreach(_.processAllAvailable())
    plan.queries.foreach(_.stop()) // abrupt halt of every stage
    mem.addData(chunk2: _*) // data keeps arriving while the cascade is down

    // heal: relaunch the whole cascade from the same root — every stage
    // resumes from its own checkpoint; the supervisor now owns the
    // stages and would auto-restart any that fail from here on
    val sup = new Supervisor(spark, maxRestarts = 3, backoffMs = 50)
    val plan2 = BarCascade.start(spark, mem.toDF(), "bar", Seq("broker", "symbol"),
      "ts", "bid", "seq", timeframes, root, supervisor = Some(sup))
    val sinks =
      try {
        plan2.queries.foreach(_.processAllAvailable())
        plan2.queries.foreach(_.processAllAvailable())
        snapshot(plan2)
      } finally sup.close()
    assert(sup.restartCount("bar_1s_rows") == 0, "clean restart, not a failure loop")
    sinks
  }

  private def assertExactlyOnce(healed: Map[String, Seq[String]]): Unit = {
    assert(uninterrupted.keySet == healed.keySet)
    for (label <- uninterrupted.keySet) {
      assert(healed(label) == uninterrupted(label),
        s"sink '$label' diverged after kill+restart: " +
          s"A=${uninterrupted(label).size} rows, B=${healed(label).size} rows")
    }
    assert(uninterrupted("hub").size > 3000, s"hub volume sanity: ${uninterrupted("hub").size}")
    assert(uninterrupted("1m").size > 50, s"1m volume sanity: ${uninterrupted("1m").size}")
    assert(uninterrupted("5m").size > 8, s"5m volume sanity: ${uninterrupted("5m").size}")
  }

  test("kill after hub drain (1m/5m lagging) + restart reproduces the uninterrupted run") {
    // hub's 1s bars committed; the 1m/5m stages have unconsumed input
    // and unsealed windows — the worst place to die for the cascade
    assertExactlyOnce(killAndHeal(drainStages = 1))
  }

  test("kill inside the 1m→5m handoff (5m lagging) + restart reproduces it too") {
    // hub AND 1m drained, the 5m stage mid-consumption of 1m bars —
    // covers the remaining restart window: a file-source stage resuming
    // on a sink another restarted stage is still appending to
    assertExactlyOnce(killAndHeal(drainStages = 2))
  }
}
