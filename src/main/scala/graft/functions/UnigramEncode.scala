package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Shared Viterbi segmentation core for the unigram-LM tokenizer
  * (Kudo 2018, the SentencePiece unigram model): the EXACT same routine
  * runs inside the [[UnigramEncode]] expression per row and inside
  * `Tokenizer.trainUnigram`'s driver-side EM loop, so the trained model
  * and the production encoder can never disagree on a segmentation.
  *
  * Deterministic by construction: the DP maximizes summed piece
  * log-probs; exact score ties prefer the segmentation whose LAST piece
  * is longest (scanning start positions ascending with a strict
  * improvement test), applied recursively backward. A single code point
  * absent from the vocabulary still segments — as itself, at `floor`
  * log-prob — so every string round-trips losslessly; multi-cp pieces
  * must be in the vocabulary.
  */
object UnigramCodec {

  /** Code-point boundary offsets of `w`: length n+1 for n code points. */
  def cpBounds(w: String): Array[Int] = {
    val b = new Array[Int](w.codePointCount(0, w.length) + 1)
    var i = 0
    var p = 0
    while (p < w.length) {
      b(i) = p
      p += Character.charCount(w.codePointAt(p))
      i += 1
    }
    b(i) = w.length
    b
  }

  /** Max-likelihood segmentation of `word` under piece log-probs `lp`
    * (`maxLen` = longest piece in code points, `floor` = unknown-single-
    * cp fallback). Returns the pieces in order; empty word → empty.
    */
  def viterbi(
      word: String,
      lp: java.util.HashMap[String, java.lang.Double],
      maxLen: Int,
      floor: Double
  ): Array[String] = {
    if (word.isEmpty) return Array.empty
    val b = cpBounds(word)
    val n = b.length - 1
    val best = new Array[Double](n + 1)
    val back = new Array[Int](n + 1)
    java.util.Arrays.fill(best, Double.NegativeInfinity)
    best(0) = 0.0
    var i = 1
    while (i <= n) {
      var j = math.max(0, i - maxLen)
      while (j < i) {
        if (best(j) > Double.NegativeInfinity) {
          val piece = word.substring(b(j), b(i))
          val s = lp.get(piece)
          val score =
            if (s != null) s.doubleValue()
            else if (i - j == 1) floor
            else Double.NegativeInfinity
          if (score > Double.NegativeInfinity) {
            val cand = best(j) + score
            // strict >: the FIRST (smallest j = longest last piece)
            // candidate wins exact ties — deterministic
            if (cand > best(i)) { best(i) = cand; back(i) = j }
          }
        }
        j += 1
      }
      i += 1
    }
    var cnt = 0
    var p = n
    while (p > 0) { cnt += 1; p = back(p) }
    val out = new Array[String](cnt)
    p = n
    var k = cnt - 1
    while (p > 0) {
      out(k) = word.substring(b(back(p)), b(p))
      p = back(p)
      k -= 1
    }
    out
  }
}

/** `unigram_encode(text)` → array<string> of unigram-LM subword tokens
  * against the broadcast-literal `pieces` (piece → log-prob). Same
  * contract as [[BpeEncode]]: words split on single spaces, each
  * segmented independently ([[UnigramCodec.viterbi]]); with
  * `boundaryMarker` set, every word after the first carries the marker
  * on its first token (an empty word emits the marker alone), so decode
  * = concat + marker→space is the exact inverse. Interpreted eval only
  * ([[CodegenFallback]]) — a per-row DP loop, the [[PqCodec]] rationale.
  */
case class UnigramEncode(
    child: Expression,
    pieces: Seq[(String, Double)],
    boundaryMarker: Option[String] = None)
    extends UnaryExpression
    with CodegenFallback {

  require(pieces.nonEmpty, "unigram_encode needs a non-empty vocabulary")

  override def dataType: DataType = ArrayType(StringType, containsNull = false)

  override def checkInputDataTypes(): TypeCheckResult =
    child.dataType match {
      case StringType => TypeCheckResult.TypeCheckSuccess
      case other =>
        TypeCheckResult.TypeCheckFailure(
          s"unigram_encode expects a string, got ${other.sql}")
    }

  @transient private lazy val lp: java.util.HashMap[String, java.lang.Double] = {
    val m = new java.util.HashMap[String, java.lang.Double](pieces.size * 2)
    pieces.foreach { case (p, s) => m.putIfAbsent(p, s) }
    m
  }
  @transient private lazy val maxLen =
    pieces.iterator.map(p => p._1.codePointCount(0, p._1.length)).max
  @transient private lazy val floor =
    pieces.iterator.map(_._2).min - 10.0

  // word → tokens memo, per deserialized instance (= per task): the
  // Viterbi DP runs once per DISTINCT word per task instead of once
  // per occurrence (Zipfian words — the BpeEncode memo rationale);
  // bounded at BpeEncode.MemoCap, no eviction.
  @transient private lazy val memo =
    new java.util.HashMap[String, Array[String]]()

  private def segment(word: String): Array[String] = {
    val cached = memo.get(word)
    if (cached != null) return cached
    val toks = UnigramCodec.viterbi(word, lp, maxLen, floor)
    if (memo.size < BpeEncode.MemoCap) memo.put(word, toks)
    toks
  }

  override def nullSafeEval(input: Any): Any = {
    val text = input.asInstanceOf[UTF8String].toString
    val words = text.split(" ", -1)
    val out = scala.collection.mutable.ArrayBuffer.empty[Any]
    var w = 0
    while (w < words.length) {
      val toks = segment(words(w))
      boundaryMarker match {
        case Some(mark) if w > 0 =>
          if (toks.isEmpty) out += UTF8String.fromString(mark)
          else {
            out += UTF8String.fromString(mark + toks(0))
            var t = 1
            while (t < toks.length) { out += UTF8String.fromString(toks(t)); t += 1 }
          }
        case _ =>
          var t = 0
          while (t < toks.length) { out += UTF8String.fromString(toks(t)); t += 1 }
      }
      w += 1
    }
    new GenericArrayData(out.toArray)
  }

  override protected def withNewChildInternal(newChild: Expression): UnigramEncode =
    copy(child = newChild)
}
