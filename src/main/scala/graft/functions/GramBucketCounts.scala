package graft.functions

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.trees.BinaryLike
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

import java.nio.ByteBuffer

/** The DSIR fit pass as ONE bounded aggregate: per input row, walk the
  * text's word-n-gram buckets (the [[HashedGrams]] loop the scoring
  * fold shares) and count every occurrence — raw counts in cells
  * [0, buckets), target-subset counts in [buckets, 2·buckets). Output
  * is a single `2·buckets`-long array.
  *
  * This replaces the explode→hash-aggregate fit (one row per gram
  * OCCURRENCE through a Generate and an exchange — 27M rows at sf1,
  * measured ~4× this aggregate's wall; BASELINE.md round 15): here the
  * corpus contributes one fixed-size buffer per partition and the
  * exchange carries `partitions × 16·buckets` bytes no matter the
  * corpus size — the [[MomentsAgg]]/[[HistogramAgg]] discipline.
  * Buffers merge by cellwise addition, so the result is exact and
  * partition-order independent (counts are integers).
  */
case class GramBucketCounts(
    text: Expression,
    isTarget: Expression,
    n: Int,
    buckets: Int,
    useXx: Boolean,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0
) extends TypedImperativeAggregate[Array[Long]]
    with BinaryLike[Expression] {

  require(n >= 1, "gram size must be >= 1")
  require(buckets >= 1, "buckets must be >= 1")

  override def left: Expression = text
  override def right: Expression = isTarget

  override def checkInputDataTypes(): TypeCheckResult =
    (text.dataType, isTarget.dataType) match {
      case (StringType, BooleanType) => TypeCheckResult.TypeCheckSuccess
      case (t, b) =>
        TypeCheckResult.TypeCheckFailure(
          s"$prettyName expects (string, boolean), got (${t.sql}, ${b.sql})")
    }

  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def nullable: Boolean = false
  override def prettyName: String = "gram_bucket_counts"

  override def createAggregationBuffer(): Array[Long] = new Array[Long](2 * buckets)

  override def update(buf: Array[Long], input: InternalRow): Array[Long] = {
    val t = text.eval(input)
    if (t != null) {
      val tgt = isTarget.eval(input)
      val isTgt = tgt != null && tgt.asInstanceOf[Boolean]
      HashedGrams.foreachBucket(t.asInstanceOf[UTF8String], n, buckets, useXx) { b =>
        buf(b) += 1L
        if (isTgt) buf(buckets + b) += 1L
      }
    }
    buf
  }

  override def merge(buf: Array[Long], other: Array[Long]): Array[Long] = {
    var i = 0
    while (i < buf.length) { buf(i) += other(i); i += 1 }
    buf
  }

  override def eval(buf: Array[Long]): Any =
    new GenericArrayData(buf.map(x => x: Any))

  override def serialize(buf: Array[Long]): Array[Byte] = {
    val bb = ByteBuffer.allocate(8 * buf.length)
    var i = 0
    while (i < buf.length) { bb.putLong(buf(i)); i += 1 }
    bb.array()
  }

  override def deserialize(bytes: Array[Byte]): Array[Long] = {
    val bb = ByteBuffer.wrap(bytes)
    val out = new Array[Long](bytes.length / 8)
    var i = 0
    while (i < out.length) { out(i) = bb.getLong(); i += 1 }
    out
  }

  override def withNewMutableAggBufferOffset(newOffset: Int): GramBucketCounts =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): GramBucketCounts =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildrenInternal(
      newLeft: Expression,
      newRight: Expression
  ): GramBucketCounts =
    copy(text = newLeft, isTarget = newRight)
}
