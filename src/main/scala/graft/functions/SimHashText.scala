package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** SimHash (Charikar '02) of a text column as ONE native per-document
  * pass — the shuffle-free twin of [[graft.operators.Dedup.simhash]]'s
  * composed form (explode tokens → md5 per token row → 16 vote-sum
  * columns in a hash aggregation). Semantics are bit-identical
  * (spec-pinned):
  *   - tokens: `split(text, " ")` with Java `limit = -1` (consecutive
  *     separators yield empty tokens, which vote like any token);
  *   - vote i comes from hex digit i of md5(token): nibble ≥ 8 → +1,
  *     else −1 (the `substring(h, i, 1) >= "8"` convention);
  *   - fingerprint bit i−1 set iff vote sum i is strictly positive.
  *
  * The composed form's cost at scale is not the md5 — it is shipping
  * every token row through the per-doc aggregation shuffle. This
  * expression keeps the whole computation inside the scan: zero
  * shuffle, zero explode, state = `bits` ints per row.
  */
case class SimHashText(child: Expression, bits: Int) extends UnaryExpression with CodegenFallback {

  require(bits >= 1 && bits <= 32, "simhash over md5 hex digits supports 1..32 bits")

  override def dataType: DataType = LongType

  override def checkInputDataTypes(): TypeCheckResult =
    child.dataType match {
      case StringType => TypeCheckResult.TypeCheckSuccess
      case other =>
        TypeCheckResult.TypeCheckFailure(s"simhash_text expects a string, got ${other.sql}")
    }

  override def nullSafeEval(input: Any): Any = {
    val toks = input.asInstanceOf[UTF8String].toString.split(" ", -1)
    val votes = new Array[Int](bits)
    val md = SimHashText.digest.get()
    var t = 0
    while (t < toks.length) {
      md.reset()
      val d = md.digest(toks(t).getBytes(java.nio.charset.StandardCharsets.UTF_8))
      var i = 0
      while (i < bits) {
        // hex digit i (1-based in the SQL form) = nibble i of the digest:
        // even i -> high nibble of byte i/2, odd -> low nibble
        val b = d(i >> 1) & 0xff
        val nibble = if ((i & 1) == 0) b >> 4 else b & 0xf
        if (nibble >= 8) votes(i) += 1 else votes(i) -= 1
        i += 1
      }
      t += 1
    }
    var fp = 0L
    var i = 0
    while (i < bits) {
      if (votes(i) > 0) fp |= 1L << i
      i += 1
    }
    fp
  }

  override protected def withNewChildInternal(newChild: Expression): SimHashText =
    copy(child = newChild)

  override def prettyName: String = "simhash_text"
}

object SimHashText {
  private val digest: ThreadLocal[java.security.MessageDigest] =
    ThreadLocal.withInitial(() => java.security.MessageDigest.getInstance("MD5"))
}
