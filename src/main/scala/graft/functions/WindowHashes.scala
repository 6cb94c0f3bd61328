package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression, XXH64}
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.Platform
import org.apache.spark.unsafe.types.UTF8String

/** All sliding token-window hashes of a text column in one native pass —
  * the explode feed of [[graft.operators.Dedup.substringDupStats]].
  *
  * The composed form (`split("\\s+")` + `transform(sequence(...), i ->
  * md5(cast(concat_ws(' ', slice(toks, i, w)) AS binary)))`) pays an
  * interpreted higher-order lambda, a slice allocation, a concat_ws and
  * an expression-tree hash eval PER WINDOW — it made q_substring_dup
  * the slowest data-bound query at 10× scale (17 s, BASELINE.md). This
  * loop tokenizes once and reuses one StringBuilder across windows.
  *
  * Value-identity contract (spec-pinned, `AsOfJoinSpec`):
  *   - tokenization is exactly `split(text, "\\s+", -1)` (leading
  *     separator run yields a leading empty token, like the SQL form);
  *   - a document with fewer than `windowTokens` tokens has ZERO
  *     windows (the composed form guards `sequence` the same way);
  *   - md5 family: lowercase-hex digest of the window's UTF-8 bytes ==
  *     `md5(cast(s AS binary))`; xxhash64 family: seed-42 XXH64 over
  *     the same bytes == `xxhash64(s)`.
  *
  * [[CodegenFallback]] by the same rationale as [[WordShingles]] /
  * [[Md5GramMin]]: the loop is already tight JVM code and sits between
  * codegen'd stages without splitting them.
  */
case class WindowHashes(child: Expression, windowTokens: Int, stride: Int, md5Family: Boolean)
    extends UnaryExpression with CodegenFallback {

  require(windowTokens >= 1, "window size must be >= 1")
  require(stride >= 1, "stride must be >= 1")

  override def dataType: DataType =
    ArrayType(if (md5Family) StringType else LongType, containsNull = false)

  override def checkInputDataTypes(): TypeCheckResult =
    child.dataType match {
      case StringType => TypeCheckResult.TypeCheckSuccess
      case other =>
        TypeCheckResult.TypeCheckFailure(s"window_hashes expects a string, got ${other.sql}")
    }

  override def nullSafeEval(input: Any): Any = {
    val toks = input.asInstanceOf[UTF8String].toString.split("\\s+", -1)
    val n = toks.length
    if (n < windowTokens) return WindowHashes.empty
    val count = (n - windowTokens) / stride + 1
    val out = new Array[Any](count)
    val sb = new java.lang.StringBuilder
    val md = if (md5Family) WindowHashes.digest.get() else null
    var k = 0
    while (k < count) {
      val i = k * stride
      sb.setLength(0)
      var j = i
      while (j < i + windowTokens) {
        if (j > i) sb.append(' ')
        sb.append(toks(j))
        j += 1
      }
      val bytes = sb.toString.getBytes(java.nio.charset.StandardCharsets.UTF_8)
      out(k) =
        if (md5Family) {
          md.reset()
          md.update(bytes)
          UTF8String.fromString(WindowHashes.hex(md.digest()))
        } else {
          XXH64.hashUnsafeBytes(bytes, Platform.BYTE_ARRAY_OFFSET, bytes.length, 42L)
        }
      k += 1
    }
    new GenericArrayData(out)
  }

  override protected def withNewChildInternal(newChild: Expression): WindowHashes =
    copy(child = newChild)

  override def prettyName: String = "window_hashes"
}

object WindowHashes {
  private val empty = new GenericArrayData(new Array[Any](0))

  private val digest: ThreadLocal[java.security.MessageDigest] =
    ThreadLocal.withInitial(() => java.security.MessageDigest.getInstance("MD5"))

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
