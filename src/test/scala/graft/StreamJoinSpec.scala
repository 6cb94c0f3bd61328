package graft

import graft.core.EntityModel
import graft.dsl.Ksql
import graft.plans.Planner
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

import java.sql.Timestamp

case class Click(user: Long, ts: Timestamp, page: String)
case class Buy(buyer: Long, ts: Timestamp, amount: Double)

/** Stream-stream join through the planner: the injected WITHIN bound
  * (default 300 s) keeps only temporally-close pairs, with watermarks
  * on both sides so join state is prunable.
  */
class StreamJoinSpec extends SparkSpec {
  import spark.implicits._

  private def t(s: String) = Timestamp.valueOf(s)

  test("stream-stream LEFT OUTER join emits null-padded rows after the watermark") {
    implicit val sqlCtx = spark.sqlContext
    val clicks = MemoryStream[Click]
    val buys = MemoryStream[Buy]
    val clickEntity = EntityModel[Click]("clicks").key("user").timestamp("ts").validated
    val buyEntity = EntityModel[Buy]("buys").key("buyer").timestamp("ts").validated

    val model = Ksql
      .from(clickEntity)
      .leftJoin(buyEntity, col("clicks.user") === col("buys.buyer"))
      .select(
        col("clicks.user").as("user"),
        col("buys.amount").as("amount")
      )
      .build()
    val joined = Planner.streaming(
      model,
      { case "clicks" => clicks.toDF(); case "buys" => buys.toDF() }
    )
    val q = joined.writeStream.format("memory").queryName("louter_join")
      .outputMode("append").start()
    try {
      clicks.addData(
        Click(1, t("2024-01-01 10:00:00"), "home"), // will match
        Click(2, t("2024-01-01 10:00:00"), "shop")  // never matches
      )
      buys.addData(Buy(1, t("2024-01-01 10:01:00"), 7.5))
      q.processAllAvailable()
      // push both watermarks far past the join window so the unmatched
      // left row is finalized with nulls
      clicks.addData(Click(9, t("2024-01-01 13:00:00"), "x"))
      buys.addData(Buy(9, t("2024-01-01 13:00:01"), 0.0))
      q.processAllAvailable()
      clicks.addData(Click(10, t("2024-01-01 14:00:00"), "x"))
      buys.addData(Buy(10, t("2024-01-01 14:00:01"), 0.0))
      q.processAllAvailable()

      val rows = spark.table("louter_join").filter($"user" < 9)
        .select($"user", $"amount").collect()
        .map(r => (r.getLong(0), Option(r.get(1)))).toSet
      assert(rows.contains((1L, Some(7.5))))
      assert(rows.contains((2L, None))) // unmatched left emitted with null
    } finally q.stop()
  }

  test("joinGrace parameterizes the stream-stream watermark delay (no hardcoded 30 s)") {
    implicit val sqlCtx = spark.sqlContext
    import org.apache.spark.sql.catalyst.plans.logical.EventTimeWatermark
    val clicks = MemoryStream[Click]
    val buys = MemoryStream[Buy]
    val clickEntity = EntityModel[Click]("clicks").key("user").timestamp("ts").validated
    val buyEntity = EntityModel[Buy]("buys").key("buyer").timestamp("ts").validated

    def delaysFor(stage: graft.dsl.QueryStage): Seq[Long] = {
      val df = Planner.streaming(
        stage.select(col("clicks.user").as("user"), col("buys.amount").as("amount")).build(),
        { case "clicks" => clicks.toDF(); case "buys" => buys.toDF() }
      )
      df.queryExecution.analyzed.collect { case e: EventTimeWatermark =>
        e.delay.microseconds / 1000000L
      }
    }

    val base = Ksql
      .from(clickEntity)
      .join(buyEntity, col("clicks.user") === col("buys.buyer"))
    // explicit grace lands on BOTH sides' watermarks
    assert(delaysFor(base.joinGrace(120)) == Seq(120L, 120L))
    // unset → planner default, not a literal in the lowering
    assert(delaysFor(base) == Seq(
      Planner.DefaultJoinGraceSeconds,
      Planner.DefaultJoinGraceSeconds
    ))
  }

  test("WITHIN-bounded stream-stream join drops far-apart pairs") {
    implicit val sqlCtx = spark.sqlContext
    val clicks = MemoryStream[Click]
    val buys = MemoryStream[Buy]

    val clickEntity = EntityModel[Click]("clicks").key("user").timestamp("ts").validated
    val buyEntity = EntityModel[Buy]("buys").key("buyer").timestamp("ts").validated

    val model = Ksql
      .from(clickEntity)
      .join(buyEntity, col("clicks.user") === col("buys.buyer"))
      .select(
        col("clicks.user").as("user"),
        col("clicks.page").as("page"),
        col("buys.amount").as("amount")
      )
      .build()

    val joined = Planner.streaming(
      model,
      { case "clicks" => clicks.toDF(); case "buys" => buys.toDF() }
    )
    assert(joined.isStreaming)
    val q = joined.writeStream.format("memory").queryName("within_join")
      .outputMode("append").start()
    try {
      clicks.addData(
        Click(1, t("2024-01-01 10:00:00"), "home"),
        Click(2, t("2024-01-01 10:00:00"), "shop")
      )
      buys.addData(
        Buy(1, t("2024-01-01 10:02:00"), 9.99),  // 2 min later: inside WITHIN
        Buy(2, t("2024-01-01 11:00:00"), 5.0)    // 1 h later: outside
      )
      q.processAllAvailable()
      // advance both watermarks so results flush
      clicks.addData(Click(9, t("2024-01-01 12:00:00"), "x"))
      buys.addData(Buy(9, t("2024-01-01 12:00:01"), 0.0))
      q.processAllAvailable()

      val rows = spark.table("within_join")
        .filter($"user" < 9)
        .select($"user", $"amount").as[(Long, Double)].collect().toSet
      assert(rows == Set((1L, 9.99))) // user 2's buy was beyond 300 s
    } finally q.stop()
  }
}
