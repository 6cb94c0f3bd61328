package graft.functions

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** The shared raw counters behind
  * [[graft.operators.TextAnalysis.langId]] and
  * [[graft.operators.TextAnalysis.qualityScore]] in one pass over the
  * text — the native twin of their composed forms (a split + five
  * `array_intersect`s for language ID, plus a second split, a
  * `regexp_replace` length diff and an intersect for quality). The
  * score/argmax math stays in Catalyst column form, so outputs are
  * value-identical by construction and every oracle that reads them
  * (q_lang_id, q_quality_score, q_curation_pipeline) holds unchanged.
  *
  * Counter contracts:
  *   - n_words: `size(split(text, " "))` — single-space split KEEPING
  *     empty tokens (Java `limit = -1` semantics);
  *   - n_chars: code points in the whole text (Spark `length`);
  *   - alpha_chars: `[A-Za-z]` occurrences (the
  *     `regexp_replace(text, "[^a-zA-Z]", "")` length convention);
  *   - hits_<lang>: DISTINCT marker words of that language present as
  *     whole tokens, case-SENSITIVE (the
  *     `array_intersect(array_distinct(toks), markers)` convention).
  *
  * [[CodegenFallback]] by the same rationale as [[WindowHashes]].
  */
case class TextSignals(child: Expression) extends UnaryExpression with CodegenFallback {

  override def dataType: DataType = StructType(
    Seq(
      StructField("n_words", LongType, nullable = false),
      StructField("n_chars", LongType, nullable = false),
      StructField("alpha_chars", LongType, nullable = false)
    ) ++ TextSignals.langs.map(l => StructField(s"hits_$l", LongType, nullable = false)))

  override def checkInputDataTypes(): TypeCheckResult =
    child.dataType match {
      case StringType => TypeCheckResult.TypeCheckSuccess
      case other =>
        TypeCheckResult.TypeCheckFailure(s"text_signals expects a string, got ${other.sql}")
    }

  override def nullSafeEval(input: Any): Any = {
    val s = input.asInstanceOf[UTF8String].toString
    val n = s.length
    var nWords = 1L // segments = separators + 1
    var alphaChars = 0L
    val masks = new Array[Int](TextSignals.langs.length)
    var i = 0
    var tokStart = 0
    while (i <= n) {
      if (i == n || s.charAt(i) == ' ') {
        if (i < n) nWords += 1
        TextSignals.markAll(s, tokStart, i, masks)
        tokStart = i + 1
      } else {
        val c = s.charAt(i)
        if ((c >= 'a' && c <= 'z') || (c >= 'A' && c <= 'Z')) alphaChars += 1
      }
      i += 1
    }
    val fields = new Array[Any](3 + masks.length)
    fields(0) = nWords
    fields(1) = s.codePointCount(0, n).toLong
    fields(2) = alphaChars
    var m = 0
    while (m < masks.length) {
      fields(3 + m) = java.lang.Integer.bitCount(masks(m)).toLong
      m += 1
    }
    new org.apache.spark.sql.catalyst.expressions.GenericInternalRow(fields)
  }

  override protected def withNewChildInternal(newChild: Expression): TextSignals =
    copy(child = newChild)

  override def prettyName: String = "text_signals"
}

object TextSignals {
  /** Language codes in the fixed marker order (must match
    * [[graft.operators.TextAnalysis.markers]]).
    */
  val langs: Array[String] = Array("de", "en", "es", "fr", "zh")

  /** markerWords(l)(w) = w-th marker of language l. Initialized from
    * TextAnalysis.markers at class-load so the two stay in lock-step.
    */
  private lazy val markerWords: Array[Array[String]] =
    langs.map(l => graft.operators.TextAnalysis.markers(l).toArray)

  /** OR the bit of every marker word equal to s[from, until) into its
    * language's mask — a token can be a marker in SEVERAL languages
    * ("la" is both es and fr), so all languages are checked.
    * Case-sensitive whole-token equality.
    */
  private def markAll(s: String, from: Int, until: Int, masks: Array[Int]): Unit = {
    val len = until - from
    var l = 0
    while (l < markerWords.length) {
      val words = markerWords(l)
      var w = 0
      while (w < words.length) {
        val mw = words(w)
        if (mw.length == len && s.regionMatches(from, mw, 0, len)) masks(l) |= 1 << w
        w += 1
      }
      l += 1
    }
  }
}
