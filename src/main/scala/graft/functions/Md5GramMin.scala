package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** The md5 (oracle-family) twin of [[GramMinHash]]: lexicographic min
  * over sampled character n-grams of `md5(cast(substring(text, i, gram)
  * AS BINARY))` — hash-identical to the composed transform-lambda form
  * (spec-pinned), O(L) instead of its O(L²/stride) substring walks.
  *
  * Two facts make the native loop cheap:
  *   - the min of lowercase-hex md5 STRINGS equals the unsigned-byte
  *     min of the raw digests (hex is order-preserving), so the loop
  *     keeps 16-byte digests and hexifies only the winner;
  *   - `getBytes` copies the row's UTF-8 bytes once, then char-aligned
  *     windows advance with two monotonic byte pointers exactly like
  *     [[GramMinHash]].
  *
  * `MessageDigest` is per-thread ([[ThreadLocal]]): a CodegenFallback
  * expression instance can be shared across local-mode task threads.
  */
case class Md5GramMin(child: Expression, gram: Int, stride: Int)
    extends UnaryExpression with CodegenFallback {

  require(gram >= 1, "gram size must be >= 1")
  require(stride >= 1, "stride must be >= 1")

  override def dataType: DataType = StringType

  override def checkInputDataTypes(): TypeCheckResult =
    child.dataType match {
      case StringType => TypeCheckResult.TypeCheckSuccess
      case other =>
        TypeCheckResult.TypeCheckFailure(s"md5_gram_min expects a string, got ${other.sql}")
    }

  override def nullSafeEval(input: Any): Any = {
    val s = input.asInstanceOf[UTF8String]
    val bytes = s.getBytes
    val nChars = s.numChars()
    val md = Md5GramMin.digest.get()
    val maxStart = math.max(nChars - gram + 1, 1)
    var startChar = 0
    var startByte = 0
    var endChar = 0
    var endByte = 0
    var min: Array[Byte] = null
    while (startChar < maxStart) {
      val targetEnd = math.min(startChar + gram, nChars)
      while (endChar < targetEnd) {
        endByte += UTF8String.numBytesForFirstByte(bytes(endByte))
        endChar += 1
      }
      md.reset()
      md.update(bytes, startByte, endByte - startByte)
      val d = md.digest()
      if (min == null || Md5GramMin.unsignedLess(d, min)) min = d
      var step = 0
      while (step < stride && startChar < maxStart) {
        if (startByte < bytes.length)
          startByte += UTF8String.numBytesForFirstByte(bytes(startByte))
        startChar += 1
        step += 1
      }
      if (startByte > endByte) { endByte = startByte; endChar = startChar }
    }
    UTF8String.fromString(Md5GramMin.hex(min))
  }

  override protected def withNewChildInternal(newChild: Expression): Md5GramMin =
    copy(child = newChild)

  override def prettyName: String = "md5_gram_min"
}

object Md5GramMin {
  private val digest: ThreadLocal[java.security.MessageDigest] =
    ThreadLocal.withInitial(() => java.security.MessageDigest.getInstance("MD5"))

  private def unsignedLess(a: Array[Byte], b: Array[Byte]): Boolean = {
    var i = 0
    while (i < a.length) {
      val ai = a(i) & 0xff
      val bi = b(i) & 0xff
      if (ai != bi) return ai < bi
      i += 1
    }
    false
  }

  private val hexChars = "0123456789abcdef".toCharArray

  private def hex(d: Array[Byte]): String = {
    val out = new Array[Char](d.length * 2)
    var i = 0
    while (i < d.length) {
      out(2 * i) = hexChars((d(i) >> 4) & 0xf)
      out(2 * i + 1) = hexChars(d(i) & 0xf)
      i += 1
    }
    new String(out)
  }
}
