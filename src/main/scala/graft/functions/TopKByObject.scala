package graft.functions

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.expressions.{Expression, UnsafeProjection, UnsafeRow}
import org.apache.spark.sql.catalyst.trees.BinaryLike
import org.apache.spark.sql.catalyst.util.{GenericArrayData, TypeUtils}
import org.apache.spark.sql.types.{ArrayType, DataType}

/** Bounded top-k-BY: keep the `k` input values with the SMALLEST
  * ordering keys, emitted as an array sorted by key ascending — the
  * k-generalization of [[MinByObject]] and the object-carrying sibling
  * of [[BoundedTopK]] (which is scalar-only).
  *
  * The load-bearing property is the PLAN it admits: a per-group rank
  * (`row_number() OVER (PARTITION BY g ORDER BY …) <= k`) must SORT
  * every candidate row — at the q_hard_negatives sf10 shape that is a
  * 5-billion-row, ~300 GB spill that exhausted this machine's disk
  * twice. As a `TypedImperativeAggregate` the same result is one
  * ObjectHashAggregate: map-side partials hold ≤ k (key, value) pairs
  * per group, the exchange carries ≤ k rows per group per partition,
  * and nothing is ever globally sorted. For descending ranks, negate
  * (or complement) the key — e.g. `struct(-cos, id)` ranks by cos
  * DESC then id ASC.
  *
  * Determinism: ties on the FULL key keep the first-seen value, so
  * include a unique tie-break column in the key when determinism
  * matters (the QueryPack window convention).
  */
case class TopKByObject(
    value: Expression,
    ord: Expression,
    k: Int,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0
) extends TypedImperativeAggregate[java.util.PriorityQueue[Array[Any]]]
    with BinaryLike[Expression] {

  require(k > 0, "top_k_by requires k > 0")

  override def left: Expression = value
  override def right: Expression = ord

  override def checkInputDataTypes(): TypeCheckResult =
    TypeUtils.checkForOrderingExpr(ord.dataType, prettyName)

  override def dataType: DataType = ArrayType(value.dataType, containsNull = true)
  override def nullable: Boolean = false
  override def prettyName: String = "top_k_by"

  @transient private lazy val ordering = TypeUtils.getInterpretedOrdering(ord.dataType)
  // MAX-heap on the key: the root is the WORST of the kept-smallest k,
  // evicted when a better candidate arrives
  @transient private lazy val heapCmp: java.util.Comparator[Array[Any]] =
    (a: Array[Any], b: Array[Any]) => ordering.compare(b(0), a(0))
  @transient private lazy val serializer =
    UnsafeProjection.create(Array(ord.dataType, value.dataType))

  override def createAggregationBuffer(): java.util.PriorityQueue[Array[Any]] =
    new java.util.PriorityQueue[Array[Any]](k + 1, heapCmp)

  private def offer(heap: java.util.PriorityQueue[Array[Any]], o: Any, v: Any): Unit =
    if (heap.size() < k) heap.add(Array(o, v))
    else if (ordering.lt(o, heap.peek()(0))) {
      heap.poll()
      heap.add(Array(o, v))
    }

  override def update(
      heap: java.util.PriorityQueue[Array[Any]],
      input: InternalRow
  ): java.util.PriorityQueue[Array[Any]] = {
    val o = ord.eval(input)
    if (o != null)
      offer(heap, InternalRow.copyValue(o), InternalRow.copyValue(value.eval(input)))
    heap
  }

  override def merge(
      heap: java.util.PriorityQueue[Array[Any]],
      other: java.util.PriorityQueue[Array[Any]]
  ): java.util.PriorityQueue[Array[Any]] = {
    other.forEach(p => offer(heap, p(0), p(1)))
    heap
  }

  override def eval(heap: java.util.PriorityQueue[Array[Any]]): Any = {
    val arr = heap.toArray(Array.empty[Array[Any]])
    java.util.Arrays.sort(arr, (a: Array[Any], b: Array[Any]) => ordering.compare(a(0), b(0)))
    new GenericArrayData(arr.map(_(1)))
  }

  override def serialize(heap: java.util.PriorityQueue[Array[Any]]): Array[Byte] = {
    val rows = new scala.collection.mutable.ArrayBuffer[Array[Byte]](heap.size())
    // .copy() before .getBytes, NOT .getBytes alone: the projection
    // reuses ONE output row, and for an all-fixed-width (ord, value)
    // schema that row's buffer is exactly sizeInBytes, so getBytes
    // returns the SHARED backing array — every element of `rows` would
    // alias the last projected element (variable-width schemas like the
    // struct keys most callers pass get copied incidentally, which is
    // why this only ever bit the scalar-scalar case). copy() allocates
    // a fresh exact-size array per element.
    heap.forEach(p => rows += serializer(InternalRow(p(0), p(1))).copy().getBytes)
    val total = 4 + rows.map(4 + _.length).sum
    val bb = java.nio.ByteBuffer.allocate(total)
    bb.putInt(rows.length)
    rows.foreach { b => bb.putInt(b.length); bb.put(b) }
    bb.array()
  }

  override def deserialize(bytes: Array[Byte]): java.util.PriorityQueue[Array[Any]] = {
    val heap = createAggregationBuffer()
    if (bytes.isEmpty) return heap
    val bb = java.nio.ByteBuffer.wrap(bytes)
    val n = bb.getInt
    var i = 0
    while (i < n) {
      val len = bb.getInt
      val chunk = new Array[Byte](len)
      bb.get(chunk)
      val row = new UnsafeRow(2)
      row.pointTo(chunk, len)
      heap.add(Array(
        InternalRow.copyValue(row.get(0, ord.dataType)),
        InternalRow.copyValue(row.get(1, value.dataType))))
      i += 1
    }
    heap
  }

  override def withNewMutableAggBufferOffset(o: Int): TopKByObject =
    copy(mutableAggBufferOffset = o)
  override def withNewInputAggBufferOffset(o: Int): TopKByObject =
    copy(inputAggBufferOffset = o)
  override protected def withNewChildrenInternal(
      newLeft: Expression,
      newRight: Expression
  ): TopKByObject = copy(value = newLeft, ord = newRight)
}

object TopKByObject {
  import org.apache.spark.sql.Column
  import org.apache.spark.sql.graftbridge.ColumnBridge

  /** `k` values with the smallest `ord` keys, array sorted by key
    * ascending (rank order).
    */
  def topKBy(value: Column, ord: Column, k: Int): Column =
    ColumnBridge.column(
      TopKByObject(
        ColumnBridge.catalystExpression(value),
        ColumnBridge.catalystExpression(ord),
        k
      ).toAggregateExpression()
    )
}
