package graft.functions

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.trees.UnaryLike
import org.apache.spark.sql.catalyst.util.{ArrayBasedMapData, GenericArrayData}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

import java.nio.ByteBuffer

/** HISTOGRAM as a bounded map-building `TypedImperativeAggregate` — the
  * scale path for the reference's HISTOGRAM registry entry
  * (`/root/reference/src/Query/Builders/Functions/KsqlFunctionRegistry.cs:90`,
  * ksqlDB semantics: VARCHAR in, MAP<VARCHAR, BIGINT> of value counts
  * out, capped at 1000 distinct keys).
  *
  * The composite form (group twice, then
  * `map_from_entries(sort_array(collect_list(...)))`,
  * [[KFunctions.histogramEntries]]) needs a second shuffle on
  * (group, value). This aggregate counts in ONE hash aggregate:
  * map-side partials are capped at `maxKeys` entries per buffer, the
  * shuffle carries ≤ `maxKeys` (string, long) pairs per group per
  * partition, and merge adds count maps.
  *
  * Cap semantics mirror ksqlDB's TopkDistinct-style histogram limit:
  * once a buffer holds `maxKeys` distinct keys, UNSEEN keys are dropped
  * (existing keys still increment). When a group's distinct-key count
  * exceeds the cap, which keys survive depends on partition merge order
  * — the same caveat ksqlDB documents across rebalances. Below the cap
  * (the designed regime) the result is exact and deterministic; output
  * keys are sorted so downstream `to_json` is stable.
  */
case class HistogramAgg(
    child: Expression,
    maxKeys: Int = HistogramAgg.DefaultMaxKeys,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0
) extends TypedImperativeAggregate[java.util.HashMap[UTF8String, Long]]
    with UnaryLike[Expression] {

  require(maxKeys > 0, "histogram requires maxKeys > 0")

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == StringType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires a STRING input, got ${child.dataType.sql}"
    )

  override def dataType: DataType =
    MapType(StringType, LongType, valueContainsNull = false)
  override def nullable: Boolean = false
  override def prettyName: String = "ksql_histogram"

  override def createAggregationBuffer(): java.util.HashMap[UTF8String, Long] =
    new java.util.HashMap[UTF8String, Long]()

  private def bump(
      buf: java.util.HashMap[UTF8String, Long],
      key: UTF8String,
      n: Long
  ): Unit = {
    // get() unboxes null→0L; counts are always ≥ 1, so 0 means absent
    val prev = buf.get(key)
    if (prev != 0L) buf.put(key, prev + n)
    else if (buf.size < maxKeys) buf.put(key.copy(), n)
    // else: cap reached, unseen key dropped (ksqlDB limit semantics)
  }

  override def update(
      buf: java.util.HashMap[UTF8String, Long],
      input: InternalRow
  ): java.util.HashMap[UTF8String, Long] = {
    val v = child.eval(input)
    if (v != null) bump(buf, v.asInstanceOf[UTF8String], 1L)
    buf
  }

  override def merge(
      buf: java.util.HashMap[UTF8String, Long],
      other: java.util.HashMap[UTF8String, Long]
  ): java.util.HashMap[UTF8String, Long] = {
    val it = other.entrySet().iterator()
    while (it.hasNext) {
      val e = it.next()
      bump(buf, e.getKey, e.getValue)
    }
    buf
  }

  override def eval(buf: java.util.HashMap[UTF8String, Long]): Any = {
    val keys = new Array[UTF8String](buf.size)
    buf.keySet().toArray(keys)
    java.util.Arrays.sort(keys, java.util.Comparator.naturalOrder[UTF8String]())
    val values = keys.map(k => buf.get(k): Any)
    new ArrayBasedMapData(
      new GenericArrayData(keys.map(x => x: Any)),
      new GenericArrayData(values)
    )
  }

  override def serialize(buf: java.util.HashMap[UTF8String, Long]): Array[Byte] = {
    var bytes = 4
    val it0 = buf.entrySet().iterator()
    while (it0.hasNext) { bytes += 4 + it0.next().getKey.numBytes() + 8 }
    val bb = ByteBuffer.allocate(bytes)
    bb.putInt(buf.size)
    val it = buf.entrySet().iterator()
    while (it.hasNext) {
      val e = it.next()
      val kb = e.getKey.getBytes
      bb.putInt(kb.length)
      bb.put(kb)
      bb.putLong(e.getValue)
    }
    bb.array()
  }

  override def deserialize(bytes: Array[Byte]): java.util.HashMap[UTF8String, Long] = {
    val bb = ByteBuffer.wrap(bytes)
    val n = bb.getInt
    val buf = new java.util.HashMap[UTF8String, Long](n * 2)
    var i = 0
    while (i < n) {
      val len = bb.getInt
      val kb = new Array[Byte](len)
      bb.get(kb)
      buf.put(UTF8String.fromBytes(kb), bb.getLong)
      i += 1
    }
    buf
  }

  override def withNewMutableAggBufferOffset(o: Int): HistogramAgg =
    copy(mutableAggBufferOffset = o)
  override def withNewInputAggBufferOffset(o: Int): HistogramAgg =
    copy(inputAggBufferOffset = o)
  override protected def withNewChildInternal(newChild: Expression): HistogramAgg =
    copy(child = newChild)
}

object HistogramAgg {
  /** ksqlDB's documented HISTOGRAM entry cap. */
  val DefaultMaxKeys = 1000
}
