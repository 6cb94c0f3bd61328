package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** `bpe_encode(text)` → array<string> of BPE subword tokens (Sennrich
  * et al. 2016, the byte-pair-encoding tokenizer every modern LLM data
  * pipeline budgets with).
  *
  * The merge table rides in as a broadcast-literal constructor
  * parameter — the [[PqCodec]] codebook idiom: it ships once per task
  * closure, never per row, and the rank lookup is a transient
  * per-executor HashMap built lazily. Encoding is the standard
  * rank-greedy loop: per whitespace word, start from characters and
  * repeatedly merge the adjacent pair with the LOWEST merge rank
  * (all of its occurrences, left to right) until no adjacent pair has
  * a rank. Rank-greedy encode reproduces the training-order merge
  * application exactly — the classic equivalence the BPE paper's
  * reference implementation relies on.
  *
  * Scale shape: one narrow per-row pass inside the scan — zero
  * shuffle, zero explode; cost O(word_len²·applied_merges) per word on
  * short natural-language words. Interpreted eval only
  * ([[CodegenFallback]]): the loops are already tight JVM code, same
  * rationale as [[SimHashText]].
  */
case class BpeEncode(
    child: Expression,
    merges: Seq[(String, String)],
    boundaryMarker: Option[String] = None)
    extends UnaryExpression
    with CodegenFallback {

  // GPT-2-style space marker: when set, every word AFTER the first has
  // its first token prefixed with the marker (an empty word emits the
  // marker alone, so runs of spaces survive). Decode is then the exact
  // inverse: concat tokens, marker → space (Tokenizer.decode). The
  // marker must not occur in the input text — callers use U+0120 "Ġ",
  // outside every natural charset's text plane by convention.

  override def dataType: DataType = ArrayType(StringType, containsNull = false)

  override def checkInputDataTypes(): TypeCheckResult =
    child.dataType match {
      case StringType => TypeCheckResult.TypeCheckSuccess
      case other =>
        TypeCheckResult.TypeCheckFailure(s"bpe_encode expects a string, got ${other.sql}")
    }

  @transient private lazy val ranks: java.util.HashMap[String, Integer] = {
    val m = new java.util.HashMap[String, Integer](merges.size * 2)
    merges.zipWithIndex.foreach { case ((a, b), i) =>
      // the " " separator never occurs inside a symbol (words are
      // split on spaces before pairing), so it is a safe composite key
      m.putIfAbsent(a + " " + b, i)
    }
    m
  }

  // word → merged symbols memo, per deserialized instance (= per task):
  // word distributions are Zipfian, so the quadratic merge loop runs
  // once per DISTINCT word per task instead of once per occurrence
  // (measured 4-9× on the tokenize/roundtrip queries at sf1/sf10, the
  // corpora repeat words heavily). Bounded: past `MemoCap` entries new
  // words encode unmemoized — no eviction churn, hot words enter first.
  @transient private lazy val memo =
    new java.util.HashMap[String, Array[UTF8String]]()

  private def encodeWord(
      word: String,
      prefix: String,
      out: java.util.ArrayList[UTF8String]): Unit = {
    val cached = memo.get(word)
    if (cached != null) { emit(cached, prefix, out); return }
    val toks = mergeWord(word)
    if (memo.size < BpeEncode.MemoCap) memo.put(word, toks)
    emit(toks, prefix, out)
  }

  private def emit(
      toks: Array[UTF8String],
      prefix: String,
      out: java.util.ArrayList[UTF8String]): Unit = {
    if (prefix.isEmpty) {
      var k = 0
      while (k < toks.length) { out.add(toks(k)); k += 1 }
    } else {
      out.add(UTF8String.concat(UTF8String.fromString(prefix), toks(0)))
      var k = 1
      while (k < toks.length) { out.add(toks(k)); k += 1 }
    }
  }

  /** The bare-word merge loop: tokens WITHOUT any boundary prefix; an
    * empty word yields one empty token (so prefix-emission is uniform).
    */
  private def mergeWord(word: String): Array[UTF8String] = {
    if (word.isEmpty) return Array(UTF8String.EMPTY_UTF8)
    // surrogate-pair aware split: one symbol per code point
    var syms = new java.util.ArrayList[String](word.length)
    var i = 0
    while (i < word.length) {
      val cp = word.codePointAt(i)
      val n = Character.charCount(cp)
      syms.add(word.substring(i, i + n))
      i += n
    }
    var done = syms.size <= 1
    while (!done) {
      var best = Int.MaxValue
      var j = 0
      while (j < syms.size - 1) {
        val r = ranks.get(syms.get(j) + " " + syms.get(j + 1))
        if (r != null && r < best) best = r
        j += 1
      }
      if (best == Int.MaxValue) done = true
      else {
        val (a, b) = merges(best)
        val next = new java.util.ArrayList[String](syms.size)
        var k = 0
        while (k < syms.size) {
          if (k < syms.size - 1 && syms.get(k) == a && syms.get(k + 1) == b) {
            next.add(a + b); k += 2
          } else { next.add(syms.get(k)); k += 1 }
        }
        syms = next
        done = syms.size <= 1
      }
    }
    val toks = new Array[UTF8String](syms.size)
    var k = 0
    while (k < syms.size) {
      toks(k) = UTF8String.fromString(syms.get(k))
      k += 1
    }
    toks
  }

  override def nullSafeEval(input: Any): Any = {
    val words = input.asInstanceOf[UTF8String].toString.split(" ", -1)
    val out = new java.util.ArrayList[UTF8String](words.length * 2)
    val marker = boundaryMarker.getOrElse("")
    var w = 0
    while (w < words.length) {
      encodeWord(words(w), if (w == 0) "" else marker, out)
      w += 1
    }
    new GenericArrayData(out.toArray)
  }

  override protected def withNewChildInternal(newChild: Expression): BpeEncode =
    copy(child = newChild)
}

object BpeEncode {
  /** Word-memo bound: ~64k distinct words per task (Zipf head). */
  val MemoCap = 1 << 16
}
