package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** 64-bit SimHash — the SCALE face of [[SimHashText]]. The 32-bit form
  * is pinned to the one-bit-per-md5-hex-digit convention so DuckDB can
  * mirror it (the q_dedup_simhash* gates); its ceiling is structural:
  * Hamming banding splits the fingerprint into `maxHamming + 1` bands,
  * and 32/4 = 8-bit bands give only 256 bucket values — at 5M docs
  * every bucket holds ~20k rows and the pairing term is quadratic
  * (q_dedup_simhash_near measured 18×/decade at sf100, BASELINE r15).
  * 64 bits double the band width to 16 bits = 65,536 buckets/band,
  * which is the Manku et al. WWW'07 production geometry; past ~10⁹
  * docs, move to the multi-block probe tables the
  * [[graft.operators.Dedup.hammingNearDup]] scaladoc describes.
  *
  * Votes come from the first 64 BITS of md5(token) (bit i = bit i&7 of
  * byte i>>3) — same digest, same tokenizer (`split(text, " ")`,
  * limit −1), same strictly-positive sign rule as the 32-bit form; no
  * engine-mirrorable SQL twin (bit extraction from md5 bytes is not
  * portable), so its queries live in benchDefs with a DedupSpec pin
  * against a driver-side reference implementation.
  */
case class SimHashText64(child: Expression) extends UnaryExpression with CodegenFallback {

  override def dataType: DataType = LongType

  override def checkInputDataTypes(): TypeCheckResult =
    child.dataType match {
      case StringType => TypeCheckResult.TypeCheckSuccess
      case other =>
        TypeCheckResult.TypeCheckFailure(s"simhash_text64 expects a string, got ${other.sql}")
    }

  override def nullSafeEval(input: Any): Any = {
    val toks = input.asInstanceOf[UTF8String].toString.split(" ", -1)
    val votes = new Array[Int](64)
    val md = SimHashText64.digest.get()
    var t = 0
    while (t < toks.length) {
      md.reset()
      val d = md.digest(toks(t).getBytes(java.nio.charset.StandardCharsets.UTF_8))
      var i = 0
      while (i < 64) {
        if (((d(i >> 3) >> (i & 7)) & 1) == 1) votes(i) += 1 else votes(i) -= 1
        i += 1
      }
      t += 1
    }
    var fp = 0L
    var i = 0
    while (i < 64) {
      if (votes(i) > 0) fp |= 1L << i
      i += 1
    }
    fp
  }

  override protected def withNewChildInternal(newChild: Expression): SimHashText64 =
    copy(child = newChild)

  override def prettyName: String = "simhash_text64"
}

object SimHashText64 {
  private val digest: ThreadLocal[java.security.MessageDigest] =
    ThreadLocal.withInitial(() => java.security.MessageDigest.getInstance("MD5"))
}
