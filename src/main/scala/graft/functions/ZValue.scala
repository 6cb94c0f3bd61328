package graft.functions

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.types._

/** `z_value(c1, c2, …)` → long Morton (Z-order) key: each input is
  * ranked against its column's broadcast-literal quantile boundaries
  * (binary search → a `bits`-bit bucket id), and the bucket bits of
  * all columns are interleaved. Sorting by this key clusters rows so
  * that a file/row-group covers a small HYPER-RECTANGLE of the key
  * space — parquet min/max stats then prune multi-dimensional range
  * queries on ANY of the z-ordered columns, not just the leading sort
  * column (the Bayer/Moricz Z-region argument UB-trees and Delta
  * OPTIMIZE ZORDER build on).
  *
  * Quantile (not uniform) boundaries make bucket occupancy even under
  * skew — a hot key range gets more buckets, so files stay balanced.
  * NULL ranks as bucket 0 (sorts first, stats still tight).
  *
  * Interpreted eval only ([[CodegenFallback]]): a per-row binary
  * search + bit shuffle, same rationale as [[PqCodec]].
  */
case class ZValue(children: Seq[Expression], boundaries: Seq[Array[Double]], bits: Int)
    extends Expression
    with CodegenFallback {

  require(children.nonEmpty, "z_value needs at least one column")
  require(children.size == boundaries.size, "one boundary array per column")
  require(bits >= 1 && bits * children.size <= 63, "bits * columns must fit a long")

  override def dataType: DataType = LongType
  override def nullable: Boolean = false

  override def checkInputDataTypes(): TypeCheckResult =
    children.find(c => !c.dataType.isInstanceOf[NumericType]) match {
      case Some(c) =>
        TypeCheckResult.TypeCheckFailure(
          s"z_value expects numeric rank projections, got ${c.dataType.sql}")
      case None => TypeCheckResult.TypeCheckSuccess
    }

  private def toDouble(v: Any): Double = v match {
    case d: Double => d
    case f: Float  => f.toDouble
    case l: Long   => l.toDouble
    case i: Int    => i.toDouble
    case s: Short  => s.toDouble
    case b: Byte   => b.toDouble
    case d: org.apache.spark.sql.types.Decimal => d.toDouble
    case other     => other.toString.toDouble
  }

  override def eval(input: InternalRow): Any = {
    val n = children.size
    var z = 0L
    var c = 0
    while (c < n) {
      val v = children(c).eval(input)
      val bucket =
        if (v == null) 0
        else {
          // boundaries are the 1/2^bits … (2^bits−1)/2^bits quantiles:
          // bucket = count of boundaries ≤ value (binary search)
          val bs = boundaries(c)
          val x = toDouble(v)
          var lo = 0
          var hi = bs.length
          while (lo < hi) {
            val mid = (lo + hi) >>> 1
            if (bs(mid) <= x) lo = mid + 1 else hi = mid
          }
          lo
        }
      // interleave: bit b of column c lands at position b*n + (n-1-c),
      // MSB-aligned so the leading column breaks ties consistently
      var b = 0
      while (b < bits) {
        if ((bucket & (1 << b)) != 0) z |= 1L << (b * n + (n - 1 - c))
        b += 1
      }
      c += 1
    }
    z
  }

  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): ZValue =
    copy(children = newChildren)
}

object ZValue {

  /** Identity boundaries: bucket(x) = x for integer x in [0, 2^bits) —
    * `ZValue` degenerates to a pure bit interleave, which an ANSI SQL
    * mirror can reproduce. Used by the q_zorder_key gate to pin the
    * production bit layout against DuckDB.
    */
  def identityBoundaries(bits: Int): Array[Double] =
    Array.tabulate((1 << bits) - 1)(i => (i + 1).toDouble)

  /** The EXACT interleave of [[ZValue.eval]] as ANSI SQL over already-
    * bucketed integer inputs: bit b of column c lands at position
    * `b*n + (n-1-c)`. Kept adjacent to the eval loop so the two bit
    * layouts cannot silently drift — q_zorder_key hash-compares them
    * row-for-row in DuckDB.
    */
  def interleaveSql(cols: Seq[String], bits: Int): String = {
    require(cols.nonEmpty && cols.size * bits <= 63)
    val n = cols.size
    (for {
      (c, cIdx) <- cols.zipWithIndex
      b <- 0 until bits
    } yield s"((($c >> $b) & 1) << ${b * n + (n - 1 - cIdx)})")
      .mkString(" | ")
  }
}
