package graft

import graft.core.Period
import graft.streaming.{BarCascade, Supervisor}
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

import java.nio.file.Files
import java.sql.Timestamp

/** CHAOS: kill the whole bar cascade mid-flight — hub drained but the
  * downstream timeframes lagging, unsealed windows in state, unread
  * data in the source — then restart every stage from its checkpoint
  * (through the [[Supervisor]]) and feed the rest. Exactly-once means
  * the sinks must equal an uninterrupted run's sinks EXACTLY: no lost
  * bars (state restored), no duplicated bars (file-sink metadata log).
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

  test("mid-cascade kill + checkpoint restart reproduces the uninterrupted run exactly") {
    implicit val sqlCtx = spark.sqlContext
    val all = ticks
    val (chunk1, chunk2) = all.splitAt(4000)
    val timeframes = Seq(Period.Minutes(1), Period.Minutes(5))

    // ---- run A: uninterrupted ------------------------------------
    val rootA = Files.createTempDirectory("cascade-a").toString
    val memA = MemoryStream[Tick]
    val planA = BarCascade.start(spark, memA.toDF(), "bar", Seq("broker", "symbol"),
      "ts", "bid", "seq", timeframes, rootA)
    val sinksA =
      try {
        memA.addData(chunk1: _*)
        planA.queries.foreach(_.processAllAvailable())
        memA.addData(chunk2: _*)
        planA.queries.foreach(_.processAllAvailable())
        planA.queries.foreach(_.processAllAvailable()) // drain the chain
        snapshot(planA)
      } finally planA.queries.foreach(_.stop())

    // ---- run B: killed mid-cascade, restarted from checkpoints ----
    val rootB = Files.createTempDirectory("cascade-b").toString
    val memB = MemoryStream[Tick]
    val planB = BarCascade.start(spark, memB.toDF(), "bar", Seq("broker", "symbol"),
      "ts", "bid", "seq", timeframes, rootB)
    memB.addData(chunk1: _*)
    // drain ONLY the hub: its 1s bars are committed, the 1m/5m stages
    // have unconsumed input and unsealed windows — the worst place to die
    planB.queries.head.processAllAvailable()
    planB.queries.foreach(_.stop()) // abrupt halt of every stage
    memB.addData(chunk2: _*) // data keeps arriving while the cascade is down

    // heal: relaunch the whole cascade from the same root — every stage
    // resumes from its own checkpoint; the supervisor now owns the
    // stages and would auto-restart any that fail from here on
    val sup = new Supervisor(spark, maxRestarts = 3, backoffMs = 50)
    val planB2 = BarCascade.start(spark, memB.toDF(), "bar", Seq("broker", "symbol"),
      "ts", "bid", "seq", timeframes, rootB, supervisor = Some(sup))
    val sinksB =
      try {
        planB2.queries.foreach(_.processAllAvailable())
        planB2.queries.foreach(_.processAllAvailable())
        snapshot(planB2)
      } finally sup.close()
    assert(sup.restartCount("bar_1s_rows") == 0, "clean restart, not a failure loop")

    // exactly-once: every sink identical, row for row
    assert(sinksA.keySet == sinksB.keySet)
    for (label <- sinksA.keySet) {
      assert(sinksB(label) == sinksA(label),
        s"sink '$label' diverged after kill+restart: " +
          s"A=${sinksA(label).size} rows, B=${sinksB(label).size} rows")
    }
    assert(sinksA("hub").size > 3000, s"hub volume sanity: ${sinksA("hub").size}")
    assert(sinksA("1m").size > 50, s"1m volume sanity: ${sinksA("1m").size}")
    assert(sinksA("5m").size > 8, s"5m volume sanity: ${sinksA("5m").size}")
  }
}
