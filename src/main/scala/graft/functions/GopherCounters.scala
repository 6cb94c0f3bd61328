package graft.functions

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** All raw counters of [[graft.operators.TextAnalysis.gopherRules]] in
  * one pass over the text — the native twin of the composed form
  * (split + filter + aggregate lambda + two regexp_replace length
  * diffs + per-token rlike + transform/intersect/distinct), which paid
  * six interpreted passes over every document. The ratio/threshold
  * math STAYS in Catalyst column form, so rule outputs are
  * value-identical by construction and the DuckDB oracle holds
  * unchanged.
  *
  * Counter contracts (each mirrors its composed counterpart exactly):
  *   - tokens: `split(text, "\\s+")` dropping empties;
  *   - word_chars: sum of token lengths in CHARACTERS (not bytes);
  *   - hash_count: '#' occurrences; ellipsis_chars: 3 × count of
  *     non-overlapping left-to-right "..." matches (the
  *     `length - length(replace(text, '...', ''))` convention);
  *   - alpha_words: tokens containing at least one [A-Za-z];
  *   - stop_hits: DISTINCT hits among the 8 fixed stopwords, matched
  *     on the lowercased token.
  *
  * [[CodegenFallback]] by the same rationale as [[WindowHashes]].
  */
case class GopherCounters(child: Expression) extends UnaryExpression with CodegenFallback {

  override def dataType: DataType = StructType(Seq(
    StructField("word_count", LongType, nullable = false),
    StructField("word_chars", LongType, nullable = false),
    StructField("hash_count", LongType, nullable = false),
    StructField("ellipsis_chars", LongType, nullable = false),
    StructField("alpha_words", LongType, nullable = false),
    StructField("stop_hits", LongType, nullable = false)))

  override def checkInputDataTypes(): TypeCheckResult =
    child.dataType match {
      case StringType => TypeCheckResult.TypeCheckSuccess
      case other =>
        TypeCheckResult.TypeCheckFailure(s"gopher_counters expects a string, got ${other.sql}")
    }

  override def nullSafeEval(input: Any): Any = {
    val s = input.asInstanceOf[UTF8String].toString
    var wordCount = 0L
    var wordChars = 0L
    var hashCount = 0L
    var ellipses = 0L
    var alphaWords = 0L
    var stopMask = 0 // bit per stopword — distinct hits
    val n = s.length
    var i = 0
    var tokStart = -1
    var tokHasAlpha = false

    def closeToken(end: Int): Unit = {
      if (tokStart >= 0) {
        wordCount += 1
        // code points, not UTF-16 units — Spark's length() convention
        wordChars += s.codePointCount(tokStart, end)
        if (tokHasAlpha) alphaWords += 1
        val idx = GopherCounters.stopIndex(s, tokStart, end)
        if (idx >= 0) stopMask |= 1 << idx
        tokStart = -1
        tokHasAlpha = false
      }
    }

    while (i < n) {
      val c = s.charAt(i)
      // \s (Java regex default): space, \t, \n, \x0B, \f, \r
      val isWs = c == ' ' || c == '\t' || c == '\n' || c == '\u000B' || c == '\f' || c == '\r'
      if (isWs) closeToken(i)
      else {
        if (tokStart < 0) tokStart = i
        if ((c >= 'a' && c <= 'z') || (c >= 'A' && c <= 'Z')) tokHasAlpha = true
        if (c == '#') hashCount += 1
        if (c == '.' && i + 2 < n && s.charAt(i + 1) == '.' && s.charAt(i + 2) == '.') {
          // non-overlapping left-to-right "..." matches; chars inside a
          // match are consumed (the regexp_replace convention). The two
          // consumed dots still belong to the current token for
          // word_chars purposes — they are counted by position, so no
          // special-casing: just skip the match scan-wise.
          ellipses += 3
          // process the two consumed chars for token accounting: they
          // are '.', non-ws, non-alpha, non-hash — nothing to add
          i += 2
        }
      }
      i += 1
    }
    closeToken(n)

    InternalRow(wordCount, wordChars, hashCount, ellipses, alphaWords,
      java.lang.Long.bitCount(stopMask.toLong).toLong)
  }

  override protected def withNewChildInternal(newChild: Expression): GopherCounters =
    copy(child = newChild)

  override def prettyName: String = "gopher_counters"
}

object GopherCounters {
  /** The 8 fixed stopwords of the rule set, in a stable order. */
  val stopwords: Array[String] =
    Array("the", "be", "to", "of", "and", "that", "have", "with")

  /** Index of the stopword equal (case-insensitively) to s[from, until),
    * or -1. Allocation-free comparison.
    */
  private def stopIndex(s: String, from: Int, until: Int): Int = {
    val len = until - from
    var w = 0
    while (w < stopwords.length) {
      val sw = stopwords(w)
      if (sw.length == len) {
        var k = 0
        var ok = true
        while (ok && k < len) {
          val c = s.charAt(from + k)
          val lower = if (c >= 'A' && c <= 'Z') (c + 32).toChar else c
          if (lower != sw.charAt(k)) ok = false
          k += 1
        }
        if (ok) return w
      }
      w += 1
    }
    -1
  }
}
