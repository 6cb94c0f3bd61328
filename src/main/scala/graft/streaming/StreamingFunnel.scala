package graft.streaming

import org.apache.spark.sql.streaming.{
  ExpiredTimerInfo, ListState, MapState, OutputMode, StatefulProcessor, TTLConfig, TimeMode,
  TimerValues
}
import org.apache.spark.sql.{Dataset, Encoders}

import java.sql.Timestamp

/** STREAMING funnel — the live face of [[graft.operators.Funnel.conversion]],
  * emitting a row the moment a user advances a stage. Semantics are
  * IDENTICAL to the batch operator on equal inputs (spec-pinned): the
  * greedy earliest-chain funnel is order-sensitive, so events buffer
  * until the event-time watermark seals them and are then replayed in
  * (ts, seq) order; once the watermark passes an event's timestamp no
  * earlier event can arrive, which makes the in-order greedy update
  * EXACT — t₁ is the first step-1 event processed, tᵢ the first step-i
  * event after tᵢ₋₁ (within the optional horizon of t₁).
  *
  * Rows older than the watermark are dropped upstream like any late
  * data (the standard stateful-streaming contract), so "equal inputs"
  * means the ON-TIME inputs: size the watermark delay to the
  * out-of-orderness the source actually exhibits.
  *
  * State per user is bounded forever: k finalized stage timestamps +
  * the events inside the watermark delay + one timer — the
  * [[StreamAsOf]] discipline. Sealed events that cannot advance the
  * chain are dropped on replay, not retained.
  */
object StreamingFunnel {

  /** `step` is the 0-based index into the funnel's step list (map the
    * event-type column before building the Dataset — non-funnel events
    * should be filtered out upstream); `seq` tie-breaks equal
    * timestamps deterministically.
    */
  final case class In(user: Long, ts: Timestamp, step: Int, seq: Long)

  /** One row per stage advance. */
  final case class Out(user: Long, stage_reached: Int, stage_ts: Timestamp)

  final case class PendingEv(tsMs: Long, step: Int, seq: Long)

  final class FunnelProcessor(numSteps: Int, horizonMs: Option[Long])
      extends StatefulProcessor[Long, In, Out] {

    // stage index (0-based) → finalized stage timestamp (epoch ms)
    @transient private var stages: MapState[Int, Long] = _
    @transient private var pending: ListState[PendingEv] = _

    override def init(outputMode: OutputMode, timeMode: TimeMode): Unit = {
      stages = getHandle.getMapState[Int, Long](
        "stages", Encoders.scalaInt, Encoders.scalaLong, TTLConfig.NONE)
      pending = getHandle.getListState[PendingEv](
        "pending", Encoders.product[PendingEv], TTLConfig.NONE)
    }

    private def rearm(atMs: Long): Unit = {
      getHandle.listTimers().foreach(getHandle.deleteTimer)
      getHandle.registerTimer(atMs)
    }

    /** Replay sealed events in (ts, seq) order through the greedy
      * chain; returns stage-advance emissions. `fresh` carries the
      * current batch's events so they never round-trip through state
      * unless they stay open past the watermark.
      *
      * State-write discipline (the StreamingScale round-13 finding):
      * every ListState.appendValue is a RocksDB MERGE, and the
      * provider's per-merge metrics hook re-reads the key's whole
      * accumulated merge-operand chain — per-ROW appends make a key's
      * batch cost quadratic in its row count (StreamAsOf measured 227
      * rows/s over 5 keys before the same fix). Every state write here
      * is one put()/appendList() per key per batch: chain length stays
      * O(1), cost O(|rows|).
      */
    private def drain(
        user: Long, wmMs: Long,
        fresh: Array[PendingEv] = Array.empty): Iterator[Out] = {
      val stored = pending.get().toArray
      val all = if (fresh.isEmpty) stored else stored ++ fresh
      val (ripe, open) = all.partition(_.tsMs <= wmMs)
      if (ripe.isEmpty) {
        if (fresh.nonEmpty) pending.appendList(fresh)
        if (open.nonEmpty) rearm(math.max(open.map(_.tsMs).min, wmMs + 1))
        return Iterator.empty
      }
      val done = stages.iterator().map(p => (p._1, p._2)).toMap
      val reached = scala.collection.mutable.Map(done.toSeq: _*)
      val out = scala.collection.mutable.ArrayBuffer.empty[Out]
      ripe.sortBy(e => (e.tsMs, e.seq)).foreach { e =>
        val withinHorizon = horizonMs.forall(h =>
          e.step == 0 || reached.get(0).exists(t0 => e.tsMs <= t0 + h))
        val advances =
          !reached.contains(e.step) &&
            (e.step == 0 || reached.get(e.step - 1).exists(_ < e.tsMs)) &&
            withinHorizon
        if (advances) {
          reached(e.step) = e.tsMs
          stages.updateValue(e.step, e.tsMs)
          out += Out(user, e.step + 1, new Timestamp(e.tsMs))
        }
      }
      pending.clear()
      // a completed funnel needs no buffered future events
      val keepOpen = reached.size < numSteps && open.nonEmpty
      if (keepOpen) {
        pending.put(open) // one write, not |open| merge operands
        rearm(math.max(open.map(_.tsMs).min, wmMs + 1))
      }
      out.iterator
    }

    override def handleInputRows(
        user: Long,
        rows: Iterator[In],
        tv: TimerValues
    ): Iterator[Out] = {
      val complete = stages.iterator().size >= numSteps
      val fresh =
        if (complete) Array.empty[PendingEv]
        else rows.map(r => PendingEv(r.ts.getTime, r.step, r.seq)).toArray
      drain(user, tv.getCurrentWatermarkInMs(), fresh)
    }

    override def handleExpiredTimer(
        user: Long,
        tv: TimerValues,
        expired: ExpiredTimerInfo
    ): Iterator[Out] = drain(user, tv.getCurrentWatermarkInMs())
  }

  /** Wire the funnel onto a watermarked [[In]] stream (apply
    * `withWatermark` on `ts` BEFORE calling; the delay bounds both late
    * data and buffered state).
    */
  def apply(
      events: Dataset[In],
      numSteps: Int,
      horizonMs: Option[Long] = None
  ): Dataset[Out] = {
    require(events.isStreaming,
      "StreamingFunnel is the streaming face; use Funnel.conversion for batch")
    require(numSteps >= 2, "a funnel needs at least 2 steps")
    val providerKey = "spark.sql.streaming.stateStore.providerClass"
    val spark = events.sparkSession
    if (spark.conf
        .get(providerKey, "HDFSBackedStateStoreProvider")
        .endsWith("HDFSBackedStateStoreProvider")) {
      spark.conf.set(providerKey,
        "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
    }
    events
      .groupByKey(_.user)(Encoders.scalaLong)
      .transformWithState(
        new FunnelProcessor(numSteps, horizonMs), TimeMode.EventTime(), OutputMode.Append())(
        Encoders.product[Out])
  }
}
