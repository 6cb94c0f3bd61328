package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Interval-overlap join: pairs of rows on the same key whose
  * half-open time intervals `[start, end)` overlap — the
  * session-vs-outage / exposure-vs-event join relational engines
  * express as an inequality join. Spark plans `l.s < r.e AND r.s < l.e`
  * as a per-key nested loop (BroadcastNestedLoop or a cartesian
  * per key), which is quadratic in the hot key's row count.
  *
  * This is the bucketized EQUI-join form: each interval explodes into
  * the fixed `bucketSeconds` grid cells it spans, the join runs on
  * `(key, bucket)` — hash join, shuffle bounded by rows × spanned
  * buckets — and the true-overlap predicate filters the grid
  * collisions. An overlapping pair shares every bucket from
  * `max(starts)` to `min(ends)`; emitting it ONLY in the
  * `max(starts)` bucket (which both sides provably cover) makes each
  * pair appear exactly once with NO distinct/dedup shuffle.
  *
  * Pick `bucketSeconds` near the typical interval length: cost is
  * rows × (span/bucket + 1) exploded rows on each side, and a bucket's
  * population bounds the per-cell join fan-out. Degenerate intervals
  * (`end <= start`) cannot overlap anything half-open and are dropped.
  * At 100 TB the same skew argument as every keyed operator here
  * applies: fan-out concentrates on the hottest (key, bucket) cell —
  * shrink `bucketSeconds` to split hot cells (the grid is the salt).
  */
object IntervalJoin {

  def overlap(
      left: DataFrame,
      right: DataFrame,
      keyCols: Seq[String],
      leftStart: String,
      leftEnd: String,
      rightStart: String,
      rightEnd: String,
      bucketSeconds: Long
  ): DataFrame = {
    require(keyCols.nonEmpty, "overlap join needs at least one key column")
    require(bucketSeconds > 0, "bucketSeconds must be positive")
    val dupes = left.columns.toSet.intersect(right.columns.toSet) -- keyCols
    require(dupes.isEmpty, s"rename columns shared by both sides: $dupes")

    val b = bucketSeconds * 1000000L
    // half-open: the last covered bucket is (end µs − 1) DIV b;
    // integral DIV keeps bucket ids exact longs (no double drift)
    def spanned(s: String, e: String, first: String) = Seq(
      first -> expr(s"unix_micros(`$s`) DIV $b"),
      "__bucket" -> explode(
        expr(s"sequence(unix_micros(`$s`) DIV $b, (unix_micros(`$e`) - 1) DIV $b)"))
    )

    def widen(df: DataFrame, s: String, e: String, first: String) =
      spanned(s, e, first).foldLeft(df.filter(col(e) > col(s))) {
        case (d, (name, c)) => d.withColumn(name, c)
      }
    val l = widen(left, leftStart, leftEnd, "__lb0")
    val r = widen(right, rightStart, rightEnd, "__rb0")

    l.join(r, keyCols :+ "__bucket")
      // true overlap of the half-open intervals
      .filter(col(leftStart) < col(rightEnd) && col(rightStart) < col(leftEnd))
      // emit exactly once: in the max(starts) bucket, which both cover
      .filter(greatest(col("__lb0"), col("__rb0")) === col("__bucket"))
      .drop("__bucket", "__lb0", "__rb0")
  }

  /** Streaming overlap join — Spark's native stream-stream join IS the
    * right engine here (state-store hash join + watermark pruning); the
    * operator's job is to derive the state-bound conditions it needs.
    * `maxSpanSeconds` (an upper bound on EITHER side's interval length
    * — enforce upstream) implies overlapping starts lie within
    * ±maxSpan, which gives the join the start-to-start range Spark
    * requires to seal and evict state at the watermark. Without that
    * derived bound the raw `s < e` conditions keep state forever.
    *
    * Inner join only: interval overlap is symmetric, and outer
    * null-padding for never-overlapped intervals belongs to the
    * WITHIN-join family ([[graft.plans.Planner]]).
    */
  def overlapStream(
      left: DataFrame,
      right: DataFrame,
      keyCols: Seq[String],
      leftStart: String,
      leftEnd: String,
      rightStart: String,
      rightEnd: String,
      maxSpanSeconds: Long,
      watermarkDelay: String = "10 seconds"
  ): DataFrame = {
    require(maxSpanSeconds > 0, "maxSpanSeconds must be positive")
    val lw = left.withWatermark(leftStart, watermarkDelay)
    val rw = right.withWatermark(rightStart, watermarkDelay)
    val keyCond = keyCols
      .map(k => lw(k) === rw(k))
      .reduce(_ && _)
    val overlapCond =
      lw(leftStart) < rw(rightEnd) && rw(rightStart) < lw(leftEnd)
    val stateBound =
      rw(rightStart) >= lw(leftStart) - expr(s"INTERVAL $maxSpanSeconds SECONDS") &&
        rw(rightStart) <= lw(leftStart) + expr(s"INTERVAL $maxSpanSeconds SECONDS")
    val joined = lw.join(rw, keyCond && overlapCond && stateBound, "inner")
    keyCols.foldLeft(joined)((d, k) => d.drop(rw(k)))
  }
}
