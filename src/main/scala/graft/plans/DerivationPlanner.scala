package graft.plans

import graft.core.Period
import graft.dsl.{QueryModel, TumblingSpec}

/** Derivation planner for the multi-timeframe cascade — the analysis
  * stage of the reference (`TumblingQao`,
  * `/root/reference/src/Query/Analysis/TumblingQao.cs:16-28`; plan →
  * `DerivedEntity` roles `src/Query/Analysis/DerivedEntity.cs:6-10`;
  * ordering `DerivedTumblingPipeline.cs:56-87`): one Tumbling query
  * fans out to a 1s hub rows stream plus one live table per timeframe,
  * executed hub-first then ascending timeframes, plus fill tables when
  * `continuation` is set.
  *
  * The physical lowering of this plan is `graft.streaming.BarCascade`
  * (hub + live) and `graft.streaming.GapFill` (fill).
  */
object DerivationPlanner {

  /** 7-day default hub-rows retention
    * (`DerivedTumblingPipeline.cs:24`, golden `rows_stream.sql`).
    */
  val DefaultRowsRetentionMs: Long = 604800000L

  sealed trait Role
  object Role {
    /** The 1s hub rows stream (Final1sStream — emits without EMIT
      * CHANGES, `RoleTraits.cs:7-21`).
      */
    case object HubRows extends Role
    /** Per-timeframe live windowed table (EMIT CHANGES ≈ update mode). */
    case object Live extends Role
    /** Gap-filled continuation table (heartbeat + carry-forward). */
    case object Fill extends Role
  }

  final case class DerivedEntity(
      name: String,
      role: Role,
      period: Option[Period],
      retentionMs: Option[Long],
      graceSeconds: Long
  )

  /** Ordered derivation plan for `base` from the model's tumbling spec.
    * Order is the reference's dependency-safe sequence: hub first, then
    * Live ascending by timeframe, then Fill ascending.
    */
  def plan(base: String, model: QueryModel): Seq[DerivedEntity] = {
    val spec: TumblingSpec = model.tumbling.getOrElse(
      throw new IllegalArgumentException("derivation planning requires a Tumbling spec")
    )
    val grace = spec.grace.toSeconds
    val hub = DerivedEntity(
      s"${base}_1s_rows", Role.HubRows, Some(Period.Seconds(1)),
      Some(DefaultRowsRetentionMs), grace
    )
    val asc = spec.timeframes.sortBy(_.fixedSeconds.getOrElse(Long.MaxValue))
    val live = asc.map(p =>
      DerivedEntity(s"${base}_${p.label}_live", Role.Live, Some(p), None, grace)
    )
    val fills =
      if (spec.continuation)
        asc.map(p => DerivedEntity(s"${base}_${p.label}_fill", Role.Fill, Some(p), None, grace))
      else Nil
    hub +: (live ++ fills)
  }
}
