package graft.functions

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.trees.UnaryLike
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types._

import java.nio.ByteBuffer
import java.util.PriorityQueue

/** TOPK as a bounded min-heap `TypedImperativeAggregate` — the scale
  * path for the reference's TOPK/TOPKDISTINCT
  * (`KsqlFunctionRegistry.cs:91-92`).
  *
  * The composite form (`slice(sort_array(collect_list(x)))`,
  * [[KFunctions.topK]]) buffers EVERY group element before sorting —
  * O(group size) memory per group, which on a 100 TB corpus with hot
  * keys spills and can OOM an executor. This aggregate keeps at most
  * k elements per partial-aggregation buffer: map-side partials are
  * already bounded, the shuffle carries ≤ k doubles per group per
  * partition, and merge is O(k log k).
  *
  * `distinct = true` gives TOPKDISTINCT by deduplicating within the
  * bounded buffer (a small sorted set instead of a heap would also
  * work; k is small).
  */
case class BoundedTopK(
    child: Expression,
    k: Int,
    distinct: Boolean = false,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0
) extends TypedImperativeAggregate[PriorityQueue[java.lang.Double]]
    with UnaryLike[Expression] {

  require(k > 0, "bounded_topk requires k > 0")

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == DoubleType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires a DOUBLE input, got ${child.dataType.sql}"
    )
  override def dataType: DataType = ArrayType(DoubleType, containsNull = false)
  override def nullable: Boolean = false
  override def prettyName: String = if (distinct) "bounded_topk_distinct" else "bounded_topk"

  override def createAggregationBuffer(): PriorityQueue[java.lang.Double] =
    new PriorityQueue[java.lang.Double](k + 1)

  private def offer(buf: PriorityQueue[java.lang.Double], v: Double): Unit = {
    if (distinct && buf.contains(v)) return
    if (buf.size < k) { buf.add(v); return }
    if (buf.peek() < v) { buf.poll(); buf.add(v) }
  }

  override def update(
      buf: PriorityQueue[java.lang.Double],
      input: InternalRow
  ): PriorityQueue[java.lang.Double] = {
    val v = child.eval(input)
    if (v != null) offer(buf, v.asInstanceOf[Double])
    buf
  }

  override def merge(
      buf: PriorityQueue[java.lang.Double],
      other: PriorityQueue[java.lang.Double]
  ): PriorityQueue[java.lang.Double] = {
    other.forEach(v => offer(buf, v))
    buf
  }

  override def eval(buf: PriorityQueue[java.lang.Double]): Any = {
    val arr = new Array[Double](buf.size)
    var i = 0
    buf.forEach { v => arr(i) = v; i += 1 }
    java.util.Arrays.sort(arr)
    val desc = new Array[Any](arr.length)
    var j = 0
    while (j < arr.length) { desc(j) = arr(arr.length - 1 - j); j += 1 }
    new GenericArrayData(desc)
  }

  override def serialize(buf: PriorityQueue[java.lang.Double]): Array[Byte] = {
    val bb = ByteBuffer.allocate(4 + 8 * buf.size)
    bb.putInt(buf.size)
    buf.forEach(v => bb.putDouble(v))
    bb.array()
  }

  override def deserialize(bytes: Array[Byte]): PriorityQueue[java.lang.Double] = {
    val bb = ByteBuffer.wrap(bytes)
    val n = bb.getInt
    val buf = createAggregationBuffer()
    var i = 0
    while (i < n) { buf.add(bb.getDouble) ; i += 1 }
    buf
  }

  override def withNewMutableAggBufferOffset(o: Int): BoundedTopK =
    copy(mutableAggBufferOffset = o)
  override def withNewInputAggBufferOffset(o: Int): BoundedTopK =
    copy(inputAggBufferOffset = o)
  override protected def withNewChildInternal(newChild: Expression): BoundedTopK =
    copy(child = newChild)
}

object BoundedTopK {

  /** Register `bounded_topk(col, k)` / `bounded_topk_distinct(col, k)`
    * in the session's function registry so they are usable from both
    * `expr(...)` and SQL.
    */
  def register(spark: org.apache.spark.sql.SparkSession): Unit = {
    def lit(e: Expression): Int =
      e.eval(InternalRow.empty).asInstanceOf[Number].intValue()
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "bounded_topk",
      exprs => BoundedTopK(exprs(0), lit(exprs(1))).toAggregateExpression(),
      "built-in"
    )
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "bounded_topk_distinct",
      exprs => BoundedTopK(exprs(0), lit(exprs(1)), distinct = true).toAggregateExpression(),
      "built-in"
    )
  }
}
