package graft.functions

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.trees.UnaryLike
import org.apache.spark.sql.catalyst.util.{GenericArrayData, TypeUtils}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

import java.nio.ByteBuffer
import java.util.PriorityQueue

/** TOPK as a bounded min-heap `TypedImperativeAggregate` — the scale
  * path for the reference's TOPK/TOPKDISTINCT
  * (`KsqlFunctionRegistry.cs:91-92`). Like ksqlDB's, it is typed over
  * the orderable scalar inputs (INT/BIGINT/FLOAT/DOUBLE/DECIMAL/
  * VARCHAR/TIMESTAMP/DATE) and returns `ARRAY<input type>` sorted
  * descending.
  *
  * The composite form (`slice(sort_array(collect_list(x)))`,
  * [[KFunctions.topK]]) buffers EVERY group element before sorting —
  * O(group size) memory per group, which on a 100 TB corpus with hot
  * keys spills and can OOM an executor. This aggregate keeps at most
  * k elements per partial-aggregation buffer: map-side partials are
  * already bounded, the shuffle carries ≤ k values per group per
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
) extends TypedImperativeAggregate[PriorityQueue[Any]]
    with UnaryLike[Expression] {

  require(k > 0, "bounded_topk requires k > 0")

  override def checkInputDataTypes(): TypeCheckResult =
    child.dataType match {
      case IntegerType | LongType | FloatType | DoubleType | StringType |
          TimestampType | DateType =>
        TypeCheckResult.TypeCheckSuccess
      case _: DecimalType => TypeCheckResult.TypeCheckSuccess
      case other =>
        TypeCheckResult.TypeCheckFailure(
          s"$prettyName requires an orderable scalar input, got ${other.sql}"
        )
    }
  override def dataType: DataType = ArrayType(child.dataType, containsNull = false)
  override def nullable: Boolean = false
  override def prettyName: String = if (distinct) "bounded_topk_distinct" else "bounded_topk"

  @transient private lazy val ordering: Ordering[Any] =
    TypeUtils.getInterpretedOrdering(child.dataType)

  override def createAggregationBuffer(): PriorityQueue[Any] =
    new PriorityQueue[Any](k + 1, ordering)

  /** UTF8String evals can alias row-backed buffers — own the bytes
    * before they outlive the row.
    */
  private def owned(v: Any): Any = v match {
    case s: UTF8String => s.copy()
    case other         => other
  }

  private def offer(buf: PriorityQueue[Any], v: Any): Unit = {
    if (distinct && buf.contains(v)) return
    if (buf.size < k) { buf.add(owned(v)); return }
    if (ordering.lt(buf.peek(), v)) { buf.poll(); buf.add(owned(v)) }
  }

  override def update(buf: PriorityQueue[Any], input: InternalRow): PriorityQueue[Any] = {
    val v = child.eval(input)
    if (v != null) offer(buf, v)
    buf
  }

  override def merge(buf: PriorityQueue[Any], other: PriorityQueue[Any]): PriorityQueue[Any] = {
    other.forEach(v => offer(buf, v))
    buf
  }

  override def eval(buf: PriorityQueue[Any]): Any = {
    val arr = new Array[Any](buf.size)
    var i = 0
    buf.forEach { v => arr(i) = v; i += 1 }
    java.util.Arrays.sort(arr.asInstanceOf[Array[AnyRef]], ordering.asInstanceOf[java.util.Comparator[AnyRef]])
    // ascending → descending in place
    var lo = 0
    var hi = arr.length - 1
    while (lo < hi) {
      val t = arr(lo); arr(lo) = arr(hi); arr(hi) = t
      lo += 1; hi -= 1
    }
    new GenericArrayData(arr)
  }

  override def serialize(buf: PriorityQueue[Any]): Array[Byte] = child.dataType match {
    case StringType =>
      var bytes = 4
      buf.forEach(v => bytes += 4 + v.asInstanceOf[UTF8String].numBytes())
      val bb = ByteBuffer.allocate(bytes)
      bb.putInt(buf.size)
      buf.forEach { v =>
        val b = v.asInstanceOf[UTF8String].getBytes
        bb.putInt(b.length)
        bb.put(b)
      }
      bb.array()
    case IntegerType | DateType =>
      val bb = ByteBuffer.allocate(4 + 4 * buf.size)
      bb.putInt(buf.size)
      buf.forEach(v => bb.putInt(v.asInstanceOf[Int]))
      bb.array()
    case LongType | TimestampType =>
      val bb = ByteBuffer.allocate(4 + 8 * buf.size)
      bb.putInt(buf.size)
      buf.forEach(v => bb.putLong(v.asInstanceOf[Long]))
      bb.array()
    case FloatType =>
      val bb = ByteBuffer.allocate(4 + 4 * buf.size)
      bb.putInt(buf.size)
      buf.forEach(v => bb.putFloat(v.asInstanceOf[Float]))
      bb.array()
    case DoubleType =>
      val bb = ByteBuffer.allocate(4 + 8 * buf.size)
      bb.putInt(buf.size)
      buf.forEach(v => bb.putDouble(v.asInstanceOf[Double]))
      bb.array()
    case _: DecimalType =>
      // length-prefixed unscaled BigInteger bytes; scale/precision are
      // fixed by the declared type, so only the magnitude travels
      var bytes = 4
      val staged = new java.util.ArrayList[Array[Byte]](buf.size)
      buf.forEach { v =>
        val b = v.asInstanceOf[Decimal].toJavaBigDecimal.unscaledValue.toByteArray
        staged.add(b)
        bytes += 4 + b.length
      }
      val bb = ByteBuffer.allocate(bytes)
      bb.putInt(staged.size)
      staged.forEach { b => bb.putInt(b.length); bb.put(b) }
      bb.array()
    case other => throw new IllegalStateException(s"unreachable: $other")
  }

  override def deserialize(bytes: Array[Byte]): PriorityQueue[Any] = {
    val bb = ByteBuffer.wrap(bytes)
    val n = bb.getInt
    val buf = createAggregationBuffer()
    var i = 0
    child.dataType match {
      case StringType =>
        while (i < n) {
          val len = bb.getInt
          val b = new Array[Byte](len)
          bb.get(b)
          buf.add(UTF8String.fromBytes(b))
          i += 1
        }
      case IntegerType | DateType =>
        while (i < n) { buf.add(bb.getInt); i += 1 }
      case LongType | TimestampType =>
        while (i < n) { buf.add(bb.getLong); i += 1 }
      case FloatType =>
        while (i < n) { buf.add(bb.getFloat); i += 1 }
      case DoubleType =>
        while (i < n) { buf.add(bb.getDouble); i += 1 }
      case d: DecimalType =>
        while (i < n) {
          val len = bb.getInt
          val b = new Array[Byte](len)
          bb.get(b)
          buf.add(
            Decimal(
              new java.math.BigDecimal(new java.math.BigInteger(b), d.scale),
              d.precision,
              d.scale
            )
          )
          i += 1
        }
      case other => throw new IllegalStateException(s"unreachable: $other")
    }
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
