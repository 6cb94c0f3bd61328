package graft.streaming

import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}
import org.apache.spark.sql.{Dataset, Encoders}

import java.sql.Timestamp

/** Heartbeat + gap fill — the reference's `continuation` pipeline
  * (`bar_1m_fill` golden output: heartbeat table LEFT JOIN live bars
  * LEFT JOIN prev-close with COALESCE carry-forward; gap policies
  * skip / carry-forward / sentinel per `/root/reference/README.md:21-24`,
  * fill service hook `src/Runtime/Fill/IStartupFillService.cs`).
  *
  * Spark re-expression: instead of generating heartbeat topics and
  * 3-way joins, a single stateful operator
  * (`flatMapGroupsWithState` + event-time timers) tracks each key's
  * last bar and emits synthetic bars for missing buckets — both gaps
  * *inside* arriving data (emitted inline) and open-ended gaps on
  * silent keys (emitted when the event-time timer fires, i.e. when the
  * global watermark passes the missing bucket).
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

  /** The per-group state transition. Public for direct unit testing. */
  def transition(periodSec: Long, policy: Policy)(
      key: String,
      rows: Iterator[BarIn],
      state: GroupState[FillState]
  ): Iterator[BarOut] = {
    val out = scala.collection.mutable.ArrayBuffer.empty[BarOut]

    if (state.hasTimedOut) {
      // silent key: fill every bucket the watermark has already sealed
      // (bucket [b, b+p) is complete once watermark >= b+p), then re-arm
      // the timer strictly beyond the current watermark
      val st = state.get
      val wmSec = state.getCurrentWatermarkMs() / 1000
      var cur = st.lastBucketSec + periodSec
      while (cur + periodSec <= wmSec) {
        fillBar(key, cur, st.lastClose, policy).foreach(out += _)
        cur += periodSec
      }
      state.update(FillState(cur - periodSec, st.lastClose))
      state.setTimeoutTimestamp((cur + periodSec) * 1000)
    } else {
      val sorted = rows.toArray.sortBy(_.bucket.getTime)
      var st = state.getOption
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
        // timeout must be strictly later than the current watermark; in
        // batch execution there is no watermark and timers never fire
        val wm = scala.util.Try(state.getCurrentWatermarkMs()).getOrElse(-1L)
        if (wm >= 0) {
          val target = (s.lastBucketSec + 2 * periodSec) * 1000
          state.setTimeoutTimestamp(math.max(target, wm + 1000))
        }
      }
    }
    out.iterator
  }

  /** Apply gap fill to a (streaming or batch) dataset of bars. The
    * stream must be watermarked on `bucket` before grouping for the
    * event-time timers to fire.
    */
  def apply(
      bars: Dataset[BarIn],
      periodSec: Long,
      policy: Policy
  ): Dataset[BarOut] = {
    implicit val outEnc = Encoders.product[BarOut]
    implicit val stEnc = Encoders.product[FillState]
    bars
      .groupByKey(_.key)(Encoders.STRING)
      .flatMapGroupsWithState(OutputMode.Append(), GroupStateTimeout.EventTimeTimeout)(
        transition(periodSec, policy)
      )
  }
}
