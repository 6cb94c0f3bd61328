package graft.functions

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.trees.UnaryLike
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._

import java.nio.ByteBuffer

/** `mat_vec(vec)` → `matrix * vec` against a broadcast-literal row-major
  * matrix (k rows × d cols) — the per-row hot loop of
  * [[graft.operators.Embeddings]]'s whitening/PCA projection. Same
  * native-over-composed rationale as [[PqEncode]]: a k×d matvec as
  * `aggregate(zip_with(...))` chains evaluates the lambdas interpreted
  * per element; this is the identical arithmetic as one tight JVM loop.
  * Interpreted eval only ([[CodegenFallback]]) — the loop is already
  * tight JVM code.
  */
case class MatVec(child: Expression, matrix: Seq[Array[Double]])
    extends UnaryExpression
    with CodegenFallback {

  require(matrix.nonEmpty, "mat_vec needs a non-empty matrix")
  require(matrix.forall(_.length == matrix.head.length),
    "mat_vec matrix rows must have equal length")

  override def dataType: DataType = ArrayType(DoubleType, containsNull = false)

  override def checkInputDataTypes(): TypeCheckResult =
    if (PqCodec.vecOk(child.dataType)) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"mat_vec expects a float/double array, got ${child.dataType.sql}")

  @transient private lazy val isFloat =
    child.dataType.asInstanceOf[ArrayType].elementType == FloatType
  @transient private lazy val d = matrix.head.length

  override def nullSafeEval(input: Any): Any = {
    val v = input.asInstanceOf[ArrayData]
    val out = new Array[Any](matrix.length)
    var r = 0
    while (r < matrix.length) {
      val row = matrix(r)
      var acc = 0.0
      var i = 0
      while (i < d) {
        acc += row(i) * PqCodec.elem(v, isFloat, i)
        i += 1
      }
      out(r) = acc
      r += 1
    }
    new GenericArrayData(out)
  }

  override protected def withNewChildInternal(newChild: Expression): MatVec =
    copy(child = newChild)
}

/** `moments(vec)` — one-pass accumulation of n, Σx (d doubles) and the
  * upper triangle of Σxxᵀ (d(d+1)/2 doubles) over a vector column: the
  * distributed half of covariance/PCA. Map-side combinable; the
  * exchange carries ONE ~d²/2-double buffer per partition regardless of
  * row count (d=64 → 17 KB), and only the final d×d matrix reaches the
  * driver (the PQ-codebook bounded-model discipline).
  *
  * Output: `struct(n BIGINT, sums ARRAY<DOUBLE>, prods ARRAY<DOUBLE>)`
  * with `prods` the row-major upper triangle (i ≤ j).
  */
case class MomentsAgg(
    child: Expression,
    dim: Int,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0
) extends TypedImperativeAggregate[MomentsAgg.Buffer]
    with UnaryLike[Expression] {
  require(dim >= 1, "moments requires dim >= 1")

  override def checkInputDataTypes(): TypeCheckResult =
    if (PqCodec.vecOk(child.dataType)) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"$prettyName expects a float/double array, got ${child.dataType.sql}")

  override def dataType: DataType = StructType(Seq(
    StructField("n", LongType, nullable = false),
    StructField("sums", ArrayType(DoubleType, containsNull = false), nullable = false),
    StructField("prods", ArrayType(DoubleType, containsNull = false), nullable = false)
  ))
  override def nullable: Boolean = false
  override def prettyName: String = "vector_moments"

  @transient private lazy val isFloat =
    child.dataType.asInstanceOf[ArrayType].elementType == FloatType

  override def createAggregationBuffer(): MomentsAgg.Buffer =
    new MomentsAgg.Buffer(dim)

  override def update(buf: MomentsAgg.Buffer, input: InternalRow): MomentsAgg.Buffer = {
    val v = child.eval(input)
    if (v != null) {
      val a = v.asInstanceOf[ArrayData]
      require(a.numElements() == dim,
        s"vector_moments: expected dim $dim, got ${a.numElements()}")
      buf.n += 1
      var i = 0
      var p = 0
      while (i < dim) {
        val xi = PqCodec.elem(a, isFloat, i)
        buf.sums(i) += xi
        var j = i
        while (j < dim) {
          buf.prods(p) += xi * PqCodec.elem(a, isFloat, j)
          p += 1
          j += 1
        }
        i += 1
      }
    }
    buf
  }

  override def merge(buf: MomentsAgg.Buffer, other: MomentsAgg.Buffer): MomentsAgg.Buffer = {
    buf.n += other.n
    var i = 0
    while (i < buf.sums.length) { buf.sums(i) += other.sums(i); i += 1 }
    var p = 0
    while (p < buf.prods.length) { buf.prods(p) += other.prods(p); p += 1 }
    buf
  }

  override def eval(buf: MomentsAgg.Buffer): Any =
    InternalRow(
      buf.n,
      new GenericArrayData(buf.sums.map(x => x: Any)),
      new GenericArrayData(buf.prods.map(x => x: Any)))

  override def serialize(buf: MomentsAgg.Buffer): Array[Byte] = {
    val bb = ByteBuffer.allocate(8 + 4 + (buf.sums.length + buf.prods.length) * 8)
    bb.putLong(buf.n)
    bb.putInt(buf.sums.length)
    buf.sums.foreach(bb.putDouble)
    buf.prods.foreach(bb.putDouble)
    bb.array()
  }

  override def deserialize(bytes: Array[Byte]): MomentsAgg.Buffer = {
    val bb = ByteBuffer.wrap(bytes)
    val n = bb.getLong
    val d = bb.getInt
    val buf = new MomentsAgg.Buffer(d)
    buf.n = n
    var i = 0
    while (i < d) { buf.sums(i) = bb.getDouble; i += 1 }
    var p = 0
    while (p < buf.prods.length) { buf.prods(p) = bb.getDouble; p += 1 }
    buf
  }

  override def withNewMutableAggBufferOffset(o: Int): MomentsAgg =
    copy(mutableAggBufferOffset = o)
  override def withNewInputAggBufferOffset(o: Int): MomentsAgg =
    copy(inputAggBufferOffset = o)
  override protected def withNewChildInternal(newChild: Expression): MomentsAgg =
    copy(child = newChild)
}

object MomentsAgg {
  final class Buffer(val dim: Int) {
    var n: Long = 0L
    val sums: Array[Double] = new Array[Double](dim)
    val prods: Array[Double] = new Array[Double](dim * (dim + 1) / 2)
  }
}
