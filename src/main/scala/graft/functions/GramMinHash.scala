package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression, XXH64}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Min-sampled character-n-gram fingerprint as one native Catalyst
  * expression: `min over i in {1, 1+stride, ...} of
  * xxhash64(substring(text, i, gram))` — the production form of
  * [[graft.operators.TextAnalysis.fingerprint]].
  *
  * The composed form (`array_min(transform(sequence(...), i ->
  * xxhash64(substring(text, i, gram))))`) is quadratic in document
  * length: `substring(text, i, gram)` must walk from the string start
  * on EVERY lambda call to find char `i`'s byte offset (UTF-8 chars are
  * variable-width), so a document of L chars pays O(L²/stride) byte
  * scanning plus a sequence array, a lambda eval, and a UTF8String
  * allocation per gram. This expression is two monotonic byte
  * pointers — window start advancing `stride` chars, window end
  * clamped at `start + gram` chars — hashing each window's bytes in
  * place ([[XXH64.hashUnsafeBytes]], seed 42 = Spark's `xxhash64`
  * seed): O(L) total, zero per-gram allocation. Hash-identical to the
  * composed twin (spec-pinned), because both hash exactly the bytes of
  * the char-aligned, end-clamped substring.
  *
  * Interpreted eval only ([[CodegenFallback]]), same rationale as
  * [[WordShingles]]: the loop is already tight JVM code and the
  * expression sits between codegen'd stages without breaking them.
  */
case class GramMinHash(child: Expression, gram: Int, stride: Int)
    extends UnaryExpression with CodegenFallback {

  require(gram >= 1, "gram size must be >= 1")
  require(stride >= 1, "stride must be >= 1")

  override def dataType: DataType = LongType

  override def checkInputDataTypes(): TypeCheckResult =
    child.dataType match {
      case StringType => TypeCheckResult.TypeCheckSuccess
      case other =>
        TypeCheckResult.TypeCheckFailure(s"gram_min_hash expects a string, got ${other.sql}")
    }

  override def nullSafeEval(input: Any): Any = {
    val s = input.asInstanceOf[UTF8String]
    val base = s.getBaseObject
    val off = s.getBaseOffset
    val nBytes = s.numBytes()
    val nChars = s.numChars()
    // positions are the composed form's sequence(1, greatest(L-gram+1, 1),
    // stride), 0-based here; substring end-clamps, so the last windows of
    // a short string shrink rather than disappear
    val maxStart = math.max(nChars - gram + 1, 1)
    var startChar = 0
    var startByte = 0
    var endChar = 0
    var endByte = 0
    var min = Long.MaxValue
    while (startChar < maxStart) {
      // advance the end pointer to min(startChar + gram, nChars)
      val targetEnd = math.min(startChar + gram, nChars)
      while (endChar < targetEnd) {
        endByte += UTF8String.numBytesForFirstByte(s.getByte(endByte))
        endChar += 1
      }
      val h = XXH64.hashUnsafeBytes(base, off + startByte, endByte - startByte, 42L)
      if (h < min) min = h
      // advance the start pointer by `stride` chars (not past the end)
      var step = 0
      while (step < stride && startChar < maxStart) {
        if (startByte < nBytes)
          startByte += UTF8String.numBytesForFirstByte(s.getByte(startByte))
        startChar += 1
        step += 1
      }
      if (startByte > endByte) { endByte = startByte; endChar = startChar }
    }
    min
  }

  override protected def withNewChildInternal(newChild: Expression): GramMinHash =
    copy(child = newChild)

  override def prettyName: String = "gram_min_hash"
}
