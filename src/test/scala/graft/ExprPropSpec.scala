package graft

import graft.functions.{BpeEncode, ZValue}
import org.apache.spark.sql.catalyst.expressions.Literal
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{DoubleType, StringType}
import org.apache.spark.unsafe.types.UTF8String
import org.scalacheck.Prop.propBoolean
import org.scalacheck.{Gen, Prop, Properties}

/** Session-free property tests for the round-11 native expressions,
  * evaluated directly through Catalyst `Literal`s (the [[PeriodsSpec]]
  * discipline: invariants over generated inputs, not examples).
  */
object ExprPropSpec extends Properties("NativeExprs") {

  // ---- BpeEncode -------------------------------------------------------

  private val sym: Gen[String] = Gen.frequency(
    8 -> Gen.alphaNumChar.map(_.toString),
    1 -> Gen.oneOf("é", "ü", "中", "ж").map(identity[String]),
    1 -> Gen.const("𝄞") // U+1D11E, a surrogate pair
  )
  private val word: Gen[String] =
    Gen.choose(0, 8).flatMap(n => Gen.listOfN(n, sym)).map(_.mkString)
  private val text: Gen[String] =
    Gen.choose(1, 5).flatMap(n => Gen.listOfN(n, word)).map(_.mkString(" "))
  private val merges: Gen[Seq[(String, String)]] =
    Gen.choose(0, 12).flatMap(n => Gen.listOfN(n, Gen.zip(sym, sym))).map(_.toSeq)

  private def encode(t: String, m: Seq[(String, String)]): Seq[String] = {
    val out = BpeEncode(Literal(UTF8String.fromString(t), StringType), m)
      .eval(null).asInstanceOf[ArrayData]
    (0 until out.numElements()).map(i => out.getUTF8String(i).toString)
  }

  property("bpe reconstructs the text modulo spaces, for ANY merge list") =
    Prop.forAll(text, merges) { (t, m) =>
      val toks = encode(t, m)
      (toks.mkString("") == t.replace(" ", "")) :| s"tokens=$toks"
    }

  private def encodeMarked(t: String, m: Seq[(String, String)]): Seq[String] = {
    val out = BpeEncode(Literal(UTF8String.fromString(t), StringType), m, Some("Ġ"))
      .eval(null).asInstanceOf[ArrayData]
    (0 until out.numElements()).map(i => out.getUTF8String(i).toString)
  }

  property("boundary-marked bpe round-trips EXACTLY, for ANY merge list") =
    Prop.forAll(text, merges) { (t, m) =>
      // generators never emit the marker char, matching its contract
      val decoded = encodeMarked(t, m).mkString("").replace("Ġ", " ")
      (decoded == t) :| s"decoded=$decoded"
    }

  property("bpe token count never exceeds code points and is deterministic") =
    Prop.forAll(text, merges) { (t, m) =>
      val toks = encode(t, m)
      val cps = t.replace(" ", "").codePointCount(0, t.replace(" ", "").length)
      // empty words contribute one empty token each, hence nonEmpty
      (toks.count(_.nonEmpty) <= cps) :| "bounded by code points" &&
      (toks == encode(t, m)) :| "deterministic"
    }

  // ---- ZValue ----------------------------------------------------------

  private val bits = 4
  private val boundariesGen: Gen[Array[Double]] =
    Gen.listOfN((1 << bits) - 1, Gen.choose(-1e6, 1e6))
      .map(_.distinct.sorted.toArray)
  private val valueGen: Gen[Double] = Gen.choose(-2e6, 2e6)

  private def z1(v: Any, bs: Array[Double]): Long =
    ZValue(Seq(Literal(v, DoubleType)), Seq(bs), bits)
      .eval(null).asInstanceOf[Long]

  private def refBucket(v: Double, bs: Array[Double]): Int = bs.count(_ <= v)

  property("z-value: single column order matches bucket order; range bounded") =
    Prop.forAll(boundariesGen, valueGen, valueGen) { (bs, a, b) =>
      val (za, zb) = (z1(a, bs), z1(b, bs))
      (za == refBucket(a, bs).toLong) :| "z equals linear-scan bucket" &&
      (za >= 0 && za < (1L << bits)) :| "range" &&
      ((refBucket(a, bs) <= refBucket(b, bs)) == (za <= zb)) :| "order preserved"
    }

  property("z-value: nulls rank first; equal buckets give equal keys; n-col range") =
    Prop.forAll(boundariesGen, boundariesGen, valueGen, valueGen) { (b1, b2, x, y) =>
      val z = ZValue(
        Seq(Literal(x, DoubleType), Literal(y, DoubleType)), Seq(b1, b2), bits)
        .eval(null).asInstanceOf[Long]
      val zn = ZValue(
        Seq(Literal(null, DoubleType), Literal(y, DoubleType)), Seq(b1, b2), bits)
        .eval(null).asInstanceOf[Long]
      val zSame = ZValue(
        Seq(Literal(x, DoubleType), Literal(y, DoubleType)), Seq(b1, b2), bits)
        .eval(null).asInstanceOf[Long]
      (z >= 0 && z < (1L << (bits * 2))) :| "range" &&
      (z == zSame) :| "deterministic" &&
      // Morton is monotone under componentwise dominance: null ranks
      // as bucket 0, so with the y-slice fixed it sorts at-or-before x
      (zn <= z) :| "null sorts at-or-before any x in the same y-slice"
    }
}
