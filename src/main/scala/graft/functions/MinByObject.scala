package graft.functions

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.expressions.{Expression, UnsafeProjection, UnsafeRow}
import org.apache.spark.sql.catalyst.trees.BinaryLike
import org.apache.spark.sql.catalyst.util.TypeUtils
import org.apache.spark.sql.types.DataType

/** `min_by`/`max_by` that stays HASH-aggregable for ANY value type.
  *
  * Spark's declarative `MinBy`/`MaxBy` put the carried value into the
  * aggregation buffer; a struct or string there is not a mutable
  * buffer type, so the whole aggregate falls back to SortAggregate — a
  * per-partition sort of every input row. Carrying document metadata
  * through a 100 TB dedup groupBy that way costs a corpus-wide sort.
  * As a `TypedImperativeAggregate` the buffer is an opaque object, the
  * plan stays ObjectHashAggregate (hash partials, no sort), and the
  * shuffle carries exactly one (ordering, value) pair per group per
  * partition.
  *
  * Null orderings are ignored (Spark `min_by` semantics); ties keep
  * the first-seen value, so use a unique ordering column (a doc id)
  * when determinism matters.
  */
case class MinByObject(
    value: Expression,
    ord: Expression,
    reverse: Boolean = false,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0
) extends TypedImperativeAggregate[Array[Any]]
    with BinaryLike[Expression] {

  override def left: Expression = value
  override def right: Expression = ord

  override def checkInputDataTypes(): TypeCheckResult =
    TypeUtils.checkForOrderingExpr(ord.dataType, prettyName)

  override def dataType: DataType = value.dataType
  override def nullable: Boolean = true
  override def prettyName: String = if (reverse) "max_by_object" else "min_by_object"

  @transient private lazy val ordering = TypeUtils.getInterpretedOrdering(ord.dataType)
  @transient private lazy val serializer =
    UnsafeProjection.create(Array(ord.dataType, value.dataType))

  /** buffer(0) = best ordering (null = empty), buffer(1) = carried value. */
  override def createAggregationBuffer(): Array[Any] = new Array[Any](2)

  private def better(candidate: Any, incumbent: Any): Boolean =
    incumbent == null ||
      (if (reverse) ordering.gt(candidate, incumbent)
       else ordering.lt(candidate, incumbent))

  override def update(buf: Array[Any], input: InternalRow): Array[Any] = {
    val o = ord.eval(input)
    if (o != null && better(o, buf(0))) {
      buf(0) = InternalRow.copyValue(o)
      buf(1) = InternalRow.copyValue(value.eval(input))
    }
    buf
  }

  override def merge(buf: Array[Any], other: Array[Any]): Array[Any] = {
    if (other(0) != null && better(other(0), buf(0))) {
      buf(0) = other(0)
      buf(1) = other(1)
    }
    buf
  }

  override def eval(buf: Array[Any]): Any = buf(1)

  override def serialize(buf: Array[Any]): Array[Byte] =
    if (buf(0) == null) Array.emptyByteArray
    // .copy() defensively: for an all-fixed-width schema the reused
    // projection row's getBytes returns its SHARED backing array (see
    // the TopKByObject.serialize note); the single-row-per-call shape
    // here happens to be consumed before the next projection, but that
    // is a caller-timing assumption serialize has no right to make
    else serializer(InternalRow(buf(0), buf(1))).copy().getBytes

  override def deserialize(bytes: Array[Byte]): Array[Any] = {
    val buf = createAggregationBuffer()
    if (bytes.nonEmpty) {
      val row = new UnsafeRow(2)
      row.pointTo(bytes, bytes.length)
      buf(0) = InternalRow.copyValue(row.get(0, ord.dataType))
      buf(1) = InternalRow.copyValue(row.get(1, value.dataType))
    }
    buf
  }

  override def withNewMutableAggBufferOffset(o: Int): MinByObject =
    copy(mutableAggBufferOffset = o)
  override def withNewInputAggBufferOffset(o: Int): MinByObject =
    copy(inputAggBufferOffset = o)
  override protected def withNewChildrenInternal(
      newLeft: Expression,
      newRight: Expression
  ): MinByObject = copy(value = newLeft, ord = newRight)
}

object MinByObject {
  import org.apache.spark.sql.Column
  import org.apache.spark.sql.graftbridge.ColumnBridge

  def minBy(value: Column, ord: Column): Column =
    ColumnBridge.column(
      MinByObject(
        ColumnBridge.catalystExpression(value),
        ColumnBridge.catalystExpression(ord)
      ).toAggregateExpression()
    )

  def maxBy(value: Column, ord: Column): Column =
    ColumnBridge.column(
      MinByObject(
        ColumnBridge.catalystExpression(value),
        ColumnBridge.catalystExpression(ord),
        reverse = true
      ).toAggregateExpression()
    )
}
