package graft.functions

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._

/** Native product-quantization codec (Jégou et al. 2011) — the hot
  * per-row loops of [[graft.operators.Similarity]]'s PQ family.
  *
  * The composed forms (`aggregate` over a literal codeword array with a
  * struct accumulator for encode; `aggregate(zip_with(...))` chains for
  * ADC) evaluate their lambdas INTERPRETED per element — measured 15–40%
  * penalties for the same arithmetic elsewhere in this repo (see the
  * round-6 minhash A/B in BASELINE.md). These expressions run the same
  * math as tight JVM loops over raw `ArrayData`.
  *
  * Bit-identical to the composed twins BY CONSTRUCTION (and spec-pinned
  * in SimilarityNativeSpec): every subspace distance accumulates in its
  * own double starting from 0.0 (matching each lambda fold's zero
  * element) before joining the cross-subspace total, floats promote to
  * double before subtraction, and encode ties keep the LOWEST codeword
  * index (strict `<`, first-wins — the fold's `when(d < best)` rule and
  * the oracle's `ORDER BY dist, c`). The DuckDB oracles hold unchanged.
  *
  * Interpreted eval only (`CodegenFallback`): the loops are already
  * tight JVM code; codegen would inline the same loops.
  */
object PqCodec {
  private[functions] def elem(a: ArrayData, isFloat: Boolean, i: Int): Double =
    if (isFloat) a.getFloat(i).toDouble else a.getDouble(i)

  private[functions] def vecOk(dt: DataType): Boolean = dt match {
    case ArrayType(FloatType, _) | ArrayType(DoubleType, _) => true
    case _                                                  => false
  }
}

/** `pq_encode(vec)` → array<int> of per-subspace argmin codeword
  * indices against the broadcast-literal `codebooks` (m subspaces ×
  * k codewords × sub dims).
  */
case class PqEncode(child: Expression, codebooks: Seq[Array[Array[Float]]])
    extends UnaryExpression
    with CodegenFallback {

  override def dataType: DataType = ArrayType(IntegerType, containsNull = false)

  override def checkInputDataTypes(): TypeCheckResult =
    if (PqCodec.vecOk(child.dataType)) TypeCheckResult.TypeCheckSuccess
    else
      TypeCheckResult.TypeCheckFailure(
        s"pq_encode expects a float/double array, got ${child.dataType.sql}")

  @transient private lazy val isFloat =
    child.dataType.asInstanceOf[ArrayType].elementType == FloatType
  @transient private lazy val m = codebooks.length
  @transient private lazy val sub = codebooks.head.head.length

  override def nullSafeEval(input: Any): Any = {
    val v = input.asInstanceOf[ArrayData]
    val codes = new Array[Int](m)
    var j = 0
    while (j < m) {
      val cb = codebooks(j)
      var best = Double.MaxValue
      var bestC = -1
      var c = 0
      while (c < cb.length) {
        val w = cb(c)
        var d = 0.0
        var i = 0
        while (i < sub) {
          val x = PqCodec.elem(v, isFloat, j * sub + i) - w(i).toDouble
          d += x * x
          i += 1
        }
        if (d < best) { best = d; bestC = c }
        c += 1
      }
      codes(j) = bestC
      j += 1
    }
    new GenericArrayData(codes)
  }

  override protected def withNewChildInternal(newChild: Expression): PqEncode =
    copy(child = newChild)
}

/** `pq_adc_dist(vec, center, code)` → double asymmetric distance
  * Σ_j ‖(vec − center)_sub_j − codebooks(j)(code_j)‖². `center` is the
  * coarse centroid for residual (IVF-PQ) spaces; pass a null literal
  * for plain PQ (no centering — the subtraction is skipped, not
  * performed against zeros, so the math matches the uncentered
  * composed form exactly).
  */
case class PqAdcDistance(
    vec: Expression,
    center: Expression,
    code: Expression,
    codebooks: Seq[Array[Array[Float]]])
    extends Expression
    with CodegenFallback {

  override def children: Seq[Expression] = Seq(vec, center, code)
  override def dataType: DataType = DoubleType
  override def nullable: Boolean = true

  override def checkInputDataTypes(): TypeCheckResult = {
    val centerOk = center.dataType == NullType || PqCodec.vecOk(center.dataType)
    val codeOk = code.dataType match {
      case ArrayType(IntegerType, _) => true
      case _                         => false
    }
    if (PqCodec.vecOk(vec.dataType) && centerOk && codeOk)
      TypeCheckResult.TypeCheckSuccess
    else
      TypeCheckResult.TypeCheckFailure(
        "pq_adc_dist expects (float/double array, float/double array | null, int array), got " +
          s"(${vec.dataType.sql}, ${center.dataType.sql}, ${code.dataType.sql})")
  }

  @transient private lazy val vecFloat =
    vec.dataType.asInstanceOf[ArrayType].elementType == FloatType
  @transient private lazy val centerFloat = center.dataType match {
    case ArrayType(FloatType, _) => true
    case _                       => false
  }
  @transient private lazy val m = codebooks.length
  @transient private lazy val sub = codebooks.head.head.length

  override def eval(input: InternalRow): Any = {
    val v = vec.eval(input)
    val k = code.eval(input)
    if (v == null || k == null) return null
    val va = v.asInstanceOf[ArrayData]
    val ka = k.asInstanceOf[ArrayData]
    val cRaw = if (center.dataType == NullType) null else center.eval(input)
    val ca = if (cRaw == null) null else cRaw.asInstanceOf[ArrayData]
    var total = 0.0
    var j = 0
    while (j < m) {
      val w = codebooks(j)(ka.getInt(j))
      // per-subspace local accumulator from 0.0 — matches the composed
      // form's per-lambda fold, keeping float addition order identical
      var d = 0.0
      var i = 0
      while (i < sub) {
        val base = PqCodec.elem(va, vecFloat, j * sub + i)
        val centered =
          if (ca == null) base
          else base - PqCodec.elem(ca, centerFloat, j * sub + i)
        val x = centered - w(i).toDouble
        d += x * x
        i += 1
      }
      total += d
      j += 1
    }
    total
  }

  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): PqAdcDistance =
    copy(vec = newChildren(0), center = newChildren(1), code = newChildren(2))
}
