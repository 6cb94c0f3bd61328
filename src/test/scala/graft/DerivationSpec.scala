package graft

import graft.core.Period
import graft.dsl.Ksql
import graft.plans.DerivationPlanner
import graft.plans.DerivationPlanner.Role
import graft.sources.TestEntities
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import scala.concurrent.duration._

/** Derivation planning: one Tumbling call fans out to hub + per-
  * timeframe entities in the reference's dependency order
  * (`DerivedTumblingPipeline.cs:56-87`), with the 7-day hub retention
  * default and fill entities under `continuation`.
  */
class DerivationSpec extends AnyFunSuite {

  private def model(continuation: Boolean) = Ksql
    .from(TestEntities.events)
    .tumbling(
      Seq(Period.Hours(1), Period.Minutes(5), Period.Minutes(1)),
      grace = 5.seconds,
      continuation = continuation
    )
    .groupBy("event_type" -> col("event_type"))
    .select(count(lit(1)).as("cnt"))
    .build()

  test("hub first, live ascending; names and retention match the convention") {
    val plan = DerivationPlanner.plan("bar", model(continuation = false))
    assert(plan.map(_.name) ==
      Seq("bar_1s_rows", "bar_1m_live", "bar_5m_live", "bar_1h_live"))
    assert(plan.head.role == Role.HubRows)
    assert(plan.head.retentionMs.contains(DerivationPlanner.DefaultRowsRetentionMs))
    assert(plan.tail.forall(_.role == Role.Live))
    assert(plan.forall(_.graceSeconds == 5))
  }

  test("continuation adds fill entities after all live entities") {
    val plan = DerivationPlanner.plan("bar", model(continuation = true))
    assert(plan.map(_.name) == Seq(
      "bar_1s_rows",
      "bar_1m_live", "bar_5m_live", "bar_1h_live",
      "bar_1m_fill", "bar_5m_fill", "bar_1h_fill"
    ))
    assert(plan.count(_.role == Role.Fill) == 3)
  }

  test("non-tumbling model is rejected") {
    val m = Ksql.from(TestEntities.events).select(col("event_id")).build()
    intercept[IllegalArgumentException](DerivationPlanner.plan("x", m))
  }
}
