package graft.functions

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.trees.UnaryLike
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types._

import java.nio.ByteBuffer
import scala.collection.mutable.ArrayBuffer

/** A mergeable KLL-style quantile sketch (Karnin-Lang-Liberty, FOCS'16)
  * over doubles — the quantile member of the engine's persisted-sketch
  * family (HLL distinct / theta set-algebra / CMS frequency in
  * [[graft.operators.Sketches]]).
  *
  * Why not `approx_percentile`: Spark's built-in is a one-shot aggregate
  * — its summary state cannot be persisted as a column, so every rollup
  * re-scans the corpus. This sketch serializes to a few-KB BINARY cell
  * ([[KllSketchAgg]]) and merges losslessly across shards/days
  * ([[KllMergeQuantilesAgg]]), which is the 100 TB shape: per-ingest-
  * batch sketches are written once next to the data, and any later
  * quantile rollup (global, per-source, trailing-window) is sketch
  * algebra over KBs, never a corpus rescan.
  *
  * Structure: geometrically-capped level buffers; level i holds items of
  * weight 2^i. When level i overflows its capacity
  * `max(2, ceil(k * (2/3)^(H-1-i)))` it is sorted and every second item
  * (offset = one deterministic LCG bit per compaction) is promoted to
  * level i+1; an odd leftover stays behind at its own weight. Rank error
  * is O(1/k) w.h.p. (spec-pinned ≤ 2.5% at k=200 in QuantileSketchSpec).
  *
  * Exactness contract (what the DuckDB-gated queries use): while total
  * retained ≤ k no compaction ever fires — every item sits at level 0
  * with weight 1, through any merge order — so quantiles are EXACTLY
  * DuckDB's `quantile_disc` (the element at 1-indexed rank `ceil(q*n)`).
  * Deterministic: the LCG is seeded from k, never from wall clock.
  */
final class KllSketch(val k: Int, private var rng: Long) {
  require(k >= 8, "kll requires k >= 8")
  var n: Long = 0L
  val levels: ArrayBuffer[ArrayBuffer[Double]] =
    ArrayBuffer(ArrayBuffer.empty[Double])

  private def capOf(level: Int, numLevels: Int): Int =
    math.max(2, math.ceil(k * math.pow(2.0 / 3.0, numLevels - 1 - level)).toInt)

  private def nextBit(): Int = {
    rng = rng * 6364136223846793005L + 1442695040888963407L
    (rng >>> 63).toInt
  }

  def update(v: Double): Unit = {
    levels(0) += v
    n += 1
    compress()
  }

  /** One pass bottom-up: compact any level over its capacity. A single
    * pass suffices per update/merge because each compaction halves the
    * offending buffer; merge() loops until quiescent.
    */
  private def compress(): Unit = {
    var changed = true
    while (changed) {
      changed = false
      var i = 0
      while (i < levels.length) {
        if (levels(i).length > capOf(i, levels.length)) {
          changed = true
          if (i + 1 == levels.length) levels += ArrayBuffer.empty[Double]
          val sorted = levels(i).toArray
          java.util.Arrays.sort(sorted)
          // parity-neutral odd leftover: an odd buffer keeps its min or
          // its max with equal probability (one extra LCG bit), not
          // always the max — always-max retention is a small systematic
          // upward skew at the compaction level (weights stay exact
          // either way; the 2.5% rank-error spec held under both).
          val odd = (sorted.length & 1) == 1
          val keepMin = odd && nextBit() == 1
          val base = if (keepMin) 1 else 0
          val limit = base + (sorted.length & ~1)
          var j = base + nextBit()
          while (j < limit) { levels(i + 1) += sorted(j); j += 2 }
          levels(i).clear()
          // an odd leftover keeps its weight at this level
          if (odd) levels(i) += (if (keepMin) sorted(0) else sorted(sorted.length - 1))
        }
        i += 1
      }
    }
  }

  def merge(other: KllSketch): Unit = {
    require(other.k == k, s"kll k mismatch: $k vs ${other.k}")
    while (levels.length < other.levels.length)
      levels += ArrayBuffer.empty[Double]
    var i = 0
    while (i < other.levels.length) {
      levels(i) ++= other.levels(i)
      i += 1
    }
    n += other.n
    rng ^= other.rng * 0x9e3779b97f4a7c15L
    compress()
  }

  /** Discrete quantiles at `probs`: the retained item whose cumulative
    * weight first reaches `ceil(q*n)` — coincides with DuckDB
    * `quantile_disc` whenever the sketch is exact (no compaction yet).
    */
  def quantiles(probs: Array[Double]): Array[Double] = {
    var m = 0
    levels.foreach(m += _.length)
    val vals = new Array[Double](m)
    val wts = new Array[Long](m)
    var p = 0
    var i = 0
    while (i < levels.length) {
      val w = 1L << i
      val b = levels(i)
      var j = 0
      while (j < b.length) { vals(p) = b(j); wts(p) = w; p += 1; j += 1 }
      i += 1
    }
    val idx = Array.range(0, m).sortBy(vals(_))
    probs.map { q =>
      val target = math.max(1L, math.ceil(q * n).toLong)
      var cum = 0L
      var r = 0
      var out = if (m == 0) Double.NaN else vals(idx(m - 1))
      var done = false
      while (r < m && !done) {
        cum += wts(idx(r))
        if (cum >= target) { out = vals(idx(r)); done = true }
        r += 1
      }
      out
    }
  }

  def serialize(): Array[Byte] = {
    var m = 0
    levels.foreach(m += _.length)
    val bb = ByteBuffer.allocate(4 + 8 + 8 + 4 + levels.length * 4 + m * 8)
    bb.putInt(k); bb.putLong(rng); bb.putLong(n); bb.putInt(levels.length)
    levels.foreach { b =>
      bb.putInt(b.length)
      b.foreach(bb.putDouble)
    }
    bb.array()
  }
}

object KllSketch {
  /** Deterministic seed: a function of k only — reproducible runs. */
  def apply(k: Int): KllSketch = new KllSketch(k, (0x5deece66dL * k) | 1L)

  def deserialize(bytes: Array[Byte]): KllSketch = {
    val bb = ByteBuffer.wrap(bytes)
    val k = bb.getInt
    val sk = new KllSketch(k, bb.getLong)
    sk.n = bb.getLong
    val h = bb.getInt
    sk.levels.clear()
    var i = 0
    while (i < h) {
      val len = bb.getInt
      val b = new ArrayBuffer[Double](len)
      var j = 0
      while (j < len) { b += bb.getDouble; j += 1 }
      sk.levels += b
      i += 1
    }
    sk
  }
}

/** Shared TypedImperativeAggregate plumbing over a [[KllSketch]] buffer. */
sealed trait KllAggBase extends UnaryLike[Expression] {
  self: TypedImperativeAggregate[KllSketch] =>
  def k: Int

  override def createAggregationBuffer(): KllSketch = KllSketch(k)
  override def merge(buf: KllSketch, other: KllSketch): KllSketch = {
    buf.merge(other); buf
  }
  override def serialize(buf: KllSketch): Array[Byte] = buf.serialize()
  override def deserialize(bytes: Array[Byte]): KllSketch =
    KllSketch.deserialize(bytes)
}

/** `kll_quantiles(x, probs, k)` — one-shot grouped quantiles as
  * ARRAY<DOUBLE> (one entry per requested probability). Nulls ignored;
  * an empty group yields NULL. ObjectHashAggregate-eligible (mutable
  * object buffer), map-side combinable: the exchange carries ≤ ~3k
  * doubles per group per partition regardless of group size.
  */
case class KllQuantilesAgg(
    child: Expression,
    probs: Seq[Double],
    k: Int,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0
) extends TypedImperativeAggregate[KllSketch]
    with KllAggBase {
  require(probs.nonEmpty && probs.forall(p => p > 0 && p <= 1),
    "probs must be in (0, 1]")

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == DoubleType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires DOUBLE input, got ${child.dataType.sql}")

  override def dataType: DataType = ArrayType(DoubleType, containsNull = false)
  override def nullable: Boolean = true
  override def prettyName: String = "kll_quantiles"

  override def update(buf: KllSketch, input: InternalRow): KllSketch = {
    val v = child.eval(input)
    if (v != null) buf.update(v.asInstanceOf[Double])
    buf
  }

  override def eval(buf: KllSketch): Any =
    if (buf.n == 0) null
    else new GenericArrayData(buf.quantiles(probs.toArray).map(x => x: Any))

  override def withNewMutableAggBufferOffset(o: Int): KllQuantilesAgg =
    copy(mutableAggBufferOffset = o)
  override def withNewInputAggBufferOffset(o: Int): KllQuantilesAgg =
    copy(inputAggBufferOffset = o)
  override protected def withNewChildInternal(newChild: Expression): KllQuantilesAgg =
    copy(child = newChild)
}

/** `kll_sketch(x, k)` — the WRITE side: the serialized sketch itself as
  * a BINARY cell, persisted next to the data (one per shard/day/batch).
  */
case class KllSketchAgg(
    child: Expression,
    k: Int,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0
) extends TypedImperativeAggregate[KllSketch]
    with KllAggBase {

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == DoubleType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires DOUBLE input, got ${child.dataType.sql}")

  override def dataType: DataType = BinaryType
  override def nullable: Boolean = false
  override def prettyName: String = "kll_sketch"

  override def update(buf: KllSketch, input: InternalRow): KllSketch = {
    val v = child.eval(input)
    if (v != null) buf.update(v.asInstanceOf[Double])
    buf
  }

  override def eval(buf: KllSketch): Any = buf.serialize()

  override def withNewMutableAggBufferOffset(o: Int): KllSketchAgg =
    copy(mutableAggBufferOffset = o)
  override def withNewInputAggBufferOffset(o: Int): KllSketchAgg =
    copy(inputAggBufferOffset = o)
  override protected def withNewChildInternal(newChild: Expression): KllSketchAgg =
    copy(child = newChild)
}

/** `kll_merge_quantiles(sketch, probs)` — the READ side: roll persisted
  * BINARY sketches up to quantiles without touching the raw data. Merge
  * is the same level-wise union the map-side combine uses, so a rollup
  * of shard sketches agrees with sketching the union directly while no
  * compaction has fired, and stays within the k-error bound after.
  */
case class KllMergeQuantilesAgg(
    child: Expression,
    probs: Seq[Double],
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0
) extends TypedImperativeAggregate[KllSketch]
    with UnaryLike[Expression] {
  require(probs.nonEmpty && probs.forall(p => p > 0 && p <= 1),
    "probs must be in (0, 1]")

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == BinaryType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires BINARY (serialized kll) input, got ${child.dataType.sql}")

  override def dataType: DataType = ArrayType(DoubleType, containsNull = false)
  override def nullable: Boolean = true
  override def prettyName: String = "kll_merge_quantiles"

  // buffer starts empty at an unknown k; adopt the first sketch's k
  // (n = -1 is the unseeded sentinel — real sketches always have n >= 0)
  override def createAggregationBuffer(): KllSketch = {
    val sk = new KllSketch(8, 1L)
    sk.n = -1L
    sk
  }

  private def seeded(buf: KllSketch): Boolean = buf.n >= 0

  override def update(buf: KllSketch, input: InternalRow): KllSketch = {
    val v = child.eval(input)
    if (v == null) return buf
    val sk = KllSketch.deserialize(v.asInstanceOf[Array[Byte]])
    if (!seeded(buf)) sk
    else { buf.merge(sk); buf }
  }

  override def merge(buf: KllSketch, other: KllSketch): KllSketch =
    if (!seeded(other)) buf
    else if (!seeded(buf)) other
    else { buf.merge(other); buf }

  override def eval(buf: KllSketch): Any =
    if (!seeded(buf) || buf.n == 0) null
    else new GenericArrayData(buf.quantiles(probs.toArray).map(x => x: Any))

  override def serialize(buf: KllSketch): Array[Byte] =
    if (!seeded(buf)) Array.emptyByteArray else buf.serialize()
  override def deserialize(bytes: Array[Byte]): KllSketch =
    if (bytes.isEmpty) createAggregationBuffer()
    else KllSketch.deserialize(bytes)

  override def withNewMutableAggBufferOffset(o: Int): KllMergeQuantilesAgg =
    copy(mutableAggBufferOffset = o)
  override def withNewInputAggBufferOffset(o: Int): KllMergeQuantilesAgg =
    copy(inputAggBufferOffset = o)
  override protected def withNewChildInternal(newChild: Expression): KllMergeQuantilesAgg =
    copy(child = newChild)
}
