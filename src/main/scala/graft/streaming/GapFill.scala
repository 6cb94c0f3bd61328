package graft.streaming

import org.apache.spark.sql.streaming.{
  ExpiredTimerInfo, OutputMode, StatefulProcessor, TTLConfig, TimeMode, TimerValues, ValueState
}
import org.apache.spark.sql.{Dataset, Encoders}

import java.sql.Timestamp

/** Heartbeat + gap fill — the reference's `continuation` pipeline
  * (`bar_1m_fill` golden output: heartbeat table LEFT JOIN live bars
  * LEFT JOIN prev-close with COALESCE carry-forward; gap policies
  * skip / carry-forward / sentinel per `/root/reference/README.md:21-24`,
  * fill service hook `src/Runtime/Fill/IStartupFillService.cs`).
  *
  * Spark re-expression: instead of generating heartbeat topics and
  * 3-way joins, a single stateful operator — a `transformWithState`
  * [[StatefulProcessor]] with event-time timers — tracks each key's
  * last bar and emits synthetic bars for missing buckets: gaps
  * *inside* arriving data are emitted inline; open-ended gaps on
  * silent keys are emitted when the per-key timer fires, i.e. when the
  * global watermark passes the missing bucket.
  *
  * `transformWithState` (Spark 4.x successor to
  * `flatMapGroupsWithState`) gives per-key timers and typed state
  * variables as first-class citizens; streaming execution requires the
  * RocksDB state store provider
  * (`spark.sql.streaming.stateStore.providerClass =
  * org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider`)
  * because the operator stores state/timers in separate column
  * families. Batch execution plans the same processor with
  * `TimeMode.None` (timers never fire — identical to the old batch
  * `flatMapGroupsWithState` contract).
  *
  * State per key is O(1) (last bucket + close), so 100 TB scale-out is
  * bounded by key cardinality only; the state store shuffles by key
  * exactly once.
  */
object GapFill {

  sealed trait Policy
  case object Skip extends Policy
  case object CarryForward extends Policy
  final case class Sentinel(value: Double) extends Policy

  final case class BarIn(key: String, bucket: Timestamp, open: Double,
      high: Double, low: Double, close: Double)
  final case class BarOut(key: String, bucket: Timestamp, open: Double,
      high: Double, low: Double, close: Double, filled: Boolean)
  final case class FillState(lastBucketSec: Long, lastClose: Double)

  private def fillBar(key: String, bucketSec: Long, lastClose: Double, policy: Policy): Option[BarOut] =
    policy match {
      case Skip => None
      case CarryForward =>
        Some(BarOut(key, new Timestamp(bucketSec * 1000), lastClose, lastClose,
          lastClose, lastClose, filled = true))
      case Sentinel(v) =>
        Some(BarOut(key, new Timestamp(bucketSec * 1000), v, v, v, v, filled = true))
    }

  /** Per-key fill processor. One ValueState (last bucket + close) and
    * at most one live timer per key: each input batch re-arms the
    * timer past the newest bucket, and an expired timer fills every
    * bucket the watermark has sealed, then re-arms itself — so a key
    * that goes silent keeps emitting synthetic bars as long as other
    * keys advance the watermark.
    */
  final class GapFillProcessor(periodSec: Long, policy: Policy)
      extends StatefulProcessor[String, BarIn, BarOut] {

    @transient private var state: ValueState[FillState] = _
    @transient private var timersEnabled: Boolean = false

    override def init(outputMode: OutputMode, timeMode: TimeMode): Unit = {
      state = getHandle.getValueState[FillState](
        "fill", Encoders.product[FillState], TTLConfig.NONE)
      timersEnabled = timeMode == TimeMode.EventTime()
    }

    /** Replace whatever timer is registered with one at `atMs` — the
      * operator keeps exactly one live timer per key.
      */
    private def rearm(atMs: Long): Unit = {
      getHandle.listTimers().foreach(getHandle.deleteTimer)
      getHandle.registerTimer(atMs)
    }

    override def handleInputRows(
        key: String,
        rows: Iterator[BarIn],
        tv: TimerValues
    ): Iterator[BarOut] = {
      val out = scala.collection.mutable.ArrayBuffer.empty[BarOut]
      val sorted = rows.toArray.sortBy(_.bucket.getTime)
      var st = if (state.exists()) Some(state.get()) else None
      sorted.foreach { b =>
        val bSec = b.bucket.getTime / 1000
        st.foreach { s =>
          var cur = s.lastBucketSec + periodSec
          while (cur < bSec) {
            fillBar(key, cur, s.lastClose, policy).foreach(out += _)
            cur += periodSec
          }
        }
        out += BarOut(b.key, b.bucket, b.open, b.high, b.low, b.close, filled = false)
        st = Some(FillState(bSec, b.close))
      }
      st.foreach { s =>
        state.update(s)
        if (timersEnabled) {
          // timer must be strictly later than the current watermark
          val wm = tv.getCurrentWatermarkInMs()
          val target = (s.lastBucketSec + 2 * periodSec) * 1000
          rearm(math.max(target, wm + 1000))
        }
      }
      out.iterator
    }

    override def handleExpiredTimer(
        key: String,
        tv: TimerValues,
        expired: ExpiredTimerInfo
    ): Iterator[BarOut] = {
      // silent key: fill every bucket the watermark has already sealed
      // (bucket [b, b+p) is complete once watermark >= b+p), then re-arm
      // strictly beyond the current watermark
      val st = state.get()
      val wmSec = tv.getCurrentWatermarkInMs() / 1000
      val out = scala.collection.mutable.ArrayBuffer.empty[BarOut]
      var cur = st.lastBucketSec + periodSec
      while (cur + periodSec <= wmSec) {
        fillBar(key, cur, st.lastClose, policy).foreach(out += _)
        cur += periodSec
      }
      state.update(FillState(cur - periodSec, st.lastClose))
      rearm((cur + periodSec) * 1000) // > wm by the loop bound
      out.iterator
    }
  }

  /** Apply gap fill to a (streaming or batch) dataset of bars. A
    * stream must be watermarked on `bucket` before grouping for the
    * event-time timers to fire; batch runs the same processor with
    * timers disabled (inline gaps only — there is no watermark to
    * seal open-ended ones).
    */
  def apply(
      bars: Dataset[BarIn],
      periodSec: Long,
      policy: Policy
  ): Dataset[BarOut] = {
    val timeMode = if (bars.isStreaming) TimeMode.EventTime() else TimeMode.None()
    if (!bars.isStreaming) {
      // batch transformWithState loads state stores too, but only a
      // streaming query start registers the coordinator endpoint —
      // force it (see the shim's scaladoc)
      org.apache.spark.sql.graftshim.StateStoreCoordinatorInit.ensure(bars.sparkSession)
    }
    bars
      .groupByKey(_.key)(Encoders.STRING)
      .transformWithState(
        new GapFillProcessor(periodSec, policy),
        timeMode,
        OutputMode.Append()
      )(Encoders.product[BarOut])
  }
}
