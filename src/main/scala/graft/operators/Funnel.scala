package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Event-sequence analytics over the events stream: ordered-step funnel
  * conversion and cohort retention — the product-analytics faces of the
  * reference's push-mode event tables (ref: the examples' order/trade
  * monitoring queries stop at windowed counts; sequencing is left to
  * the client. Here it is part of the plan.)
  *
  * Determinism: everything is MIN over timestamps and ratios of exact
  * counts — no doubles until the final rounded rate.
  */
object Funnel {

  /** Earliest-completion funnel: for each user that performed
    * `steps.head`, the earliest chain t₁ < t₂ < … (each step strictly
    * after the previous one's earliest time, all within `horizon` of
    * t₁). Output: `user`, one `t_<step>` per step (null once the chain
    * breaks), `stage_reached`.
    *
    * Semantics note (the standard "earliest event per stage" funnel):
    * each tᵢ is the earliest qualifying event given t₁..tᵢ₋₁ — greedy,
    * not global — matching the usual analytics definition; a user who
    * could only complete the funnel via a LATER step-1 event does not
    * count.
    *
    * Scale shape: one filtered scan + user-keyed equi-join + hash
    * aggregate PER STEP — each stage's frame is funnel-users-sized, the
    * events table is read once per step with the step filter pushed to
    * the scan (typed steps prune row groups), and nothing ever sorts
    * globally. Skew bounds at the hottest single user's event count.
    */
  def conversion(
      events: DataFrame,
      userCol: String,
      typeCol: String,
      tsCol: String,
      steps: Seq[String],
      horizon: Option[Column] = None
  ): DataFrame = {
    require(steps.size >= 2, "a funnel needs at least 2 steps")
    require(steps.distinct == steps, "funnel steps must be distinct")
    def tCol(step: String) = s"t_$step"
    var acc = events
      .filter(col(typeCol) === steps.head)
      .groupBy(col(userCol))
      .agg(min(col(tsCol)).as(tCol(steps.head)))
    for ((step, i) <- steps.tail.zipWithIndex) {
      val prev = tCol(steps(i))
      val within = horizon.fold(lit(true))(h =>
        col(tsCol) <= col(tCol(steps.head)) + h)
      val stage = events
        .filter(col(typeCol) === step)
        .join(
          acc.filter(col(prev).isNotNull)
            .select(col(userCol), col(tCol(steps.head)), col(prev).as("__prev")),
          Seq(userCol))
        .filter(col(tsCol) > col("__prev") && within)
        .groupBy(col(userCol))
        .agg(min(col(tsCol)).as(tCol(step)))
      acc = acc.join(stage, Seq(userCol), "left")
    }
    val stage = steps.tail
      .foldLeft(lit(1)) { (s, step) =>
        s + when(col(tCol(step)).isNotNull, 1).otherwise(0)
      }
      .as("stage_reached")
    // stage counts only the unbroken prefix: a null tᵢ forces null tᵢ₊₁
    // by construction (later stages join on the previous stage's rows)
    acc.select(col(userCol) +: steps.map(s => col(tCol(s))) :+ stage: _*)
  }

  /** Gap-based BATCH sessionization: events more than `gapSeconds`
    * apart start a new per-user session; output is one row per
    * (user, session) with count and bounds. The batch face of the
    * streaming session window (q_window_session) — run over history,
    * not state.
    *
    * Scale shape: ONE user-keyed exchange feeding both windows (lag +
    * running sum share the partition/order), then a hash agg on
    * (user, session_idx) that needs no further shuffle (it is a
    * refinement of the same key). Per-user in-partition sorts only;
    * skew bounds at the hottest user. `tieCol` makes duplicate
    * timestamps deterministic (the round-6 session-window incident,
    * BASELINE.md).
    */
  def sessionize(
      events: DataFrame,
      userCol: String,
      tsCol: String,
      tieCol: String,
      gapSeconds: Long
  ): DataFrame = {
    require(gapSeconds > 0, "gapSeconds must be positive")
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col(userCol))
      .orderBy(col(tsCol), col(tieCol))
    val prev = lag(unix_micros(col(tsCol)), 1).over(w)
    val newSess = when(
      prev.isNull || unix_micros(col(tsCol)) - prev > gapSeconds * 1000000L,
      1).otherwise(0)
    events
      .withColumn("__new", newSess)
      .withColumn(
        "session_idx",
        sum(col("__new"))
          .over(w.rowsBetween(
            org.apache.spark.sql.expressions.Window.unboundedPreceding, 0))
          .cast("int"))
      .groupBy(col(userCol), col("session_idx"))
      .agg(
        count(lit(1)).as("n_events"),
        min(col(tsCol)).as("session_start"),
        max(col(tsCol)).as("session_end"))
  }

  /** Weekly cohort retention: users grouped by the week of their first
    * event; for each (cohort_week, week_offset), how many cohort
    * members were active that week and the retained fraction. The
    * classic growth-accounting triangle.
    *
    * Scale shape: first-event table = one user-keyed hash agg; activity
    * = one distinct (user, week) agg; one user-keyed join between them;
    * final count agg + a broadcast cohort-size join. All frames after
    * the first two aggs are user- or cohort-sized.
    */
  def weeklyRetention(
      events: DataFrame,
      userCol: String,
      tsCol: String
  ): DataFrame = {
    val week = date_trunc("week", col(tsCol)).cast("date")
    val firsts = events
      .groupBy(col(userCol))
      .agg(min(week).as("cohort_week"))
    val active = events
      .select(col(userCol), week.as("active_week"))
      .distinct()
    val cohortSizes = firsts
      .groupBy(col("cohort_week"))
      .agg(count(lit(1)).as("n_cohort"))
    active
      .join(firsts, Seq(userCol))
      .groupBy(
        col("cohort_week"),
        (datediff(col("active_week"), col("cohort_week")) / 7)
          .cast("int")
          .as("week_offset"))
      .agg(count(lit(1)).as("n_active"))
      .join(broadcast(cohortSizes), Seq("cohort_week"))
      .select(
        col("cohort_week"),
        col("week_offset"),
        col("n_active"),
        col("n_cohort"),
        round(col("n_active") / col("n_cohort"), 6).as("retention"))
  }
}
