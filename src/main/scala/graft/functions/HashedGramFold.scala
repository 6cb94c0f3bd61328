package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression, XXH64}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.Platform
import org.apache.spark.unsafe.types.UTF8String

/** Σ over a document's word-n-gram occurrences of `table(bucket(gram))`
  * — the scoring kernel shared by DSIR importance weighting
  * ([[graft.operators.Selection.dsirWeights]], n = 2, table = bucket
  * log-ratios) and the hashed linear classifier
  * ([[graft.operators.Classifier.score]], n = 1, table = weights) — as
  * ONE native expression.
  *
  * Value-identical to the composed form (spec-pinned in SelectionSpec):
  * `aggregate(shinglesOf(split(text,' '), n), 0.0, (acc, g) ->
  * acc + table[gramBucket(g)])`, which evaluates a nested interpreted
  * lambda chain (transform → slice → concat_ws inside aggregate) with a
  * per-gram array allocation + string copy — measured ~4× this loop at
  * sf1 (BASELINE.md round 15). Two facts make the native loop cheap:
  *
  *   - a clamped word n-gram joined with single spaces is VERBATIM the
  *     byte span of the original text from word i's first byte to word
  *     min(i+n−1, last)'s last byte (split keeps empty words, so every
  *     separator inside the span is exactly one 0x20 byte) — no gram
  *     string is ever materialized, the hash runs over the row's bytes
  *     in place;
  *   - word boundaries are one 0x20 scan (space never occurs inside a
  *     UTF-8 multibyte sequence), so the whole row is O(bytes).
  *
  * Hash families ([[graft.operators.HashFamily]] via `useXx`):
  * md5 first-4-bytes-as-unsigned mod buckets (≡ the oracle's
  * `conv(substring(md5(g),1,8),16,10) % buckets` — hex of the first 4
  * digest bytes IS the first 8 hex digits), or Spark's xxhash64
  * (XXH64 over the gram bytes, seed 42) pmod buckets. `MessageDigest`
  * is per-thread: a CodegenFallback instance can be shared across
  * local-mode task threads.
  */
case class HashedGramFold(
    child: Expression,
    n: Int,
    buckets: Int,
    table: IndexedSeq[Double],
    useXx: Boolean
) extends UnaryExpression with CodegenFallback {

  require(n >= 1, "gram size must be >= 1")
  require(buckets >= 1, "buckets must be >= 1")
  require(table.length == buckets, s"table length ${table.length} != buckets $buckets")

  override def dataType: DataType = DoubleType

  override def checkInputDataTypes(): TypeCheckResult =
    child.dataType match {
      case StringType => TypeCheckResult.TypeCheckSuccess
      case other =>
        TypeCheckResult.TypeCheckFailure(s"hashed_gram_fold expects a string, got ${other.sql}")
    }

  // IndexedSeq keeps case-class equality structural for plan
  // canonicalization; the eval loop wants a raw array
  @transient private lazy val tableArr: Array[Double] = table.toArray

  override def nullSafeEval(input: Any): Any = {
    val t = tableArr
    var sum = 0.0
    HashedGrams.foreachBucket(input.asInstanceOf[UTF8String], n, buckets, useXx) { b =>
      sum += t(b)
    }
    sum
  }

  override protected def withNewChildInternal(newChild: Expression): HashedGramFold =
    copy(child = newChild)

  override def prettyName: String = "hashed_gram_fold"
}

/** The shared word-n-gram byte walk + bucket hash (see
  * [[HashedGramFold]]'s scaladoc for the byte-span argument and family
  * identities). Used by the scoring fold and the fit-side
  * [[GramBucketCounts]] aggregate so the two sides cannot disagree on
  * gram or bucket construction.
  */
private[graft] object HashedGrams {
  private val digest: ThreadLocal[java.security.MessageDigest] =
    ThreadLocal.withInitial(() => java.security.MessageDigest.getInstance("MD5"))

  /** Calls `f` with the bucket id of each word-n-gram occurrence, in
    * document order.
    */
  def foreachBucket(s: UTF8String, n: Int, buckets: Int, useXx: Boolean)(f: Int => Unit): Unit = {
    val bytes = s.getBytes
    val len = bytes.length
    // word start offsets: 0 and every byte after a 0x20 (split on a
    // single space keeps empty words — Spark split(text, " ") semantics)
    var nWords = 1
    var i = 0
    while (i < len) { if (bytes(i) == 0x20) nWords += 1; i += 1 }
    val starts = new Array[Int](nWords + 1)
    var w = 1
    i = 0
    while (i < len) {
      if (bytes(i) == 0x20) { starts(w) = i + 1; w += 1 }
      i += 1
    }
    starts(nWords) = len + 1 // sentinel: end of word k is starts(k+1) - 1
    val md = if (useXx) null else digest.get()
    val nGrams = math.max(nWords - n, 0) + 1
    var g = 0
    while (g < nGrams) {
      val from = starts(g)
      val lastWord = math.min(g + n - 1, nWords - 1)
      val until = starts(lastWord + 1) - 1 // strip the separator/sentinel
      val span = until - from
      val bucket =
        if (useXx) {
          val h = XXH64.hashUnsafeBytes(bytes, Platform.BYTE_ARRAY_OFFSET + from, span, 42L)
          (((h % buckets) + buckets) % buckets).toInt
        } else {
          md.reset()
          md.update(bytes, from, span)
          val d = md.digest()
          val u = ((d(0) & 0xffL) << 24) | ((d(1) & 0xffL) << 16) | ((d(2) & 0xffL) << 8) | (d(3) & 0xffL)
          (u % buckets).toInt
        }
      f(bucket)
      g += 1
    }
  }
}
