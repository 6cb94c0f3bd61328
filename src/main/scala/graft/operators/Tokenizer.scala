package graft.operators

import org.apache.spark.sql.functions._
import org.apache.spark.sql.graftbridge.ColumnBridge
import org.apache.spark.sql.{Column, DataFrame}

/** Trainable BPE tokenizer (Sennrich et al. 2016) — the token-budget
  * primitive a training-data pipeline sizes everything with. No
  * counterpart in the reference (this is LLM-pipeline scope, like the
  * dedup/ANN families); [[graft.operators.TextAnalysis.vocabulary]] is
  * the coverage-report face of the same word-count aggregate.
  *
  * Scale shape — the part that matters at 100 TB:
  *   - TRAINING never iterates over the corpus. BPE training only needs
  *     the word→count table (word-internal pairing is independent of
  *     word order), so the corpus contributes exactly ONE map-side-
  *     combinable hash aggregate; the driver-side merge loop then runs
  *     on the top-`vocabCap` rows (a `TakeOrderedAndProject` bound —
  *     only vocabCap rows ever reach one place, the
  *     [[Similarity]]-model-sample discipline). 100× more corpus means
  *     the same bounded table, just better counts.
  *   - ENCODING is a broadcast-literal native expression
  *     ([[graft.functions.BpeEncode]]): merges ship once per task
  *     closure, the pass stays inside the scan — zero shuffle, zero
  *     explode, linear in corpus bytes.
  */
object Tokenizer {

  /** Ordered merge list; apply-order = list order = rank order. */
  final case class BpeModel(merges: Seq[(String, String)]) {
    require(merges.nonEmpty, "empty BPE model — train with numMerges > 0")
  }

  /** Learn `numMerges` merges from the corpus word counts.
    *
    * Deterministic: the pair argmax breaks count ties on the
    * lexicographically smallest (left, right) pair, and the word table
    * is capped by (count desc, word asc) — same corpus, same model,
    * independent of partitioning. Training stops early when no
    * adjacent pair reaches `minPairCount` (merging noise pairs that
    * occur once buys no compression).
    */
  def train(
      df: DataFrame,
      textCol: String,
      numMerges: Int,
      vocabCap: Int = 65536,
      minPairCount: Long = 2L): BpeModel = {
    require(numMerges > 0, "numMerges must be positive")
    require(vocabCap > 0, "vocabCap must be positive")
    // the ONLY corpus-wide action: one hash agg + bounded top-K
    val wordRows = df
      .select(explode(split(col(textCol), " ")).as("word"))
      .filter(col("word") =!= "")
      .groupBy(col("word"))
      .agg(count(lit(1)).as("cnt"))
      .orderBy(col("cnt").desc, col("word"))
      .limit(vocabCap)
      .collect()

    // driver-side merge loop over the bounded table: words as symbol
    // sequences (code-point split, matching BpeEncode), counts carried
    val counts = wordRows.map(_.getLong(1))
    val words: Array[Array[String]] = wordRows.map { r =>
      val w = r.getString(0)
      val syms = scala.collection.mutable.ArrayBuffer.empty[String]
      var i = 0
      while (i < w.length) {
        val n = Character.charCount(w.codePointAt(i))
        syms += w.substring(i, i + n)
        i += n
      }
      syms.toArray
    }

    val merges = scala.collection.mutable.ArrayBuffer.empty[(String, String)]
    var iter = 0
    var exhausted = false
    while (iter < numMerges && !exhausted) {
      val pairCounts = new java.util.HashMap[(String, String), Long]()
      var w = 0
      while (w < words.length) {
        val syms = words(w)
        val c = counts(w)
        var j = 0
        while (j < syms.length - 1) {
          val p = (syms(j), syms(j + 1))
          pairCounts.merge(p, c, (a, b) => a + b)
          j += 1
        }
        w += 1
      }
      var best: (String, String) = null
      var bestCnt = minPairCount - 1
      pairCounts.forEach { (p, c) =>
        if (c > bestCnt ||
          (c == bestCnt && best != null &&
            (p._1 < best._1 || (p._1 == best._1 && p._2 < best._2)))) {
          best = p; bestCnt = c
        }
      }
      if (best == null) exhausted = true
      else {
        merges += best
        val (a, b) = best
        w = 0
        while (w < words.length) {
          val syms = words(w)
          var has = false
          var j = 0
          while (!has && j < syms.length - 1) {
            has = syms(j) == a && syms(j + 1) == b; j += 1
          }
          if (has) {
            val next = scala.collection.mutable.ArrayBuffer.empty[String]
            j = 0
            while (j < syms.length) {
              if (j < syms.length - 1 && syms(j) == a && syms(j + 1) == b) {
                next += (a + b); j += 2
              } else { next += syms(j); j += 1 }
            }
            words(w) = next.toArray
          }
          w += 1
        }
      }
      iter += 1
    }
    BpeModel(merges.toSeq)
  }

  /** GPT-2-style space marker used by [[encodeMarked]]/[[decode]]
    * (U+0120 "Ġ" — must not occur in the input text).
    */
  val BoundaryMarker = "Ġ"

  /** `array<string>` of subword tokens for `textCol` under `model`. */
  def encode(model: BpeModel)(textCol: Column): Column =
    ColumnBridge.column(
      graft.functions.BpeEncode(ColumnBridge.expression(textCol), model.merges))

  /** Like [[encode]] but word boundaries survive: every word after the
    * first carries [[BoundaryMarker]] on its first token, making
    * [[decode]] the EXACT inverse — the lossless round-trip a pipeline
    * needs when the tokenized form replaces the raw text in storage.
    *
    * The marker must not occur in the input (decode maps every
    * occurrence back to a space). That precondition is ENFORCED, not
    * just documented: a row containing U+0120 raises a clear error at
    * encode time instead of silently corrupting tokenized storage and
    * only surfacing on a later decode. The guard is a scan-local
    * `contains` + `raise_error`, codegen'd with the rest of the
    * projection.
    */
  def encodeMarked(model: BpeModel)(textCol: Column): Column = {
    val encoded = ColumnBridge.column(
      graft.functions.BpeEncode(
        ColumnBridge.expression(textCol), model.merges, Some(BoundaryMarker)))
    when(
      textCol.contains(BoundaryMarker),
      raise_error(concat(
        lit("encodeMarked: input contains the U+0120 boundary marker; " +
          "round-trip would corrupt it. Strip or remap the marker " +
          "before tokenizing: "),
        substring(textCol, 0, 40))).cast("array<string>"))
      .otherwise(encoded)
  }

  /** Exact inverse of [[encodeMarked]]: concat + marker → space. Pure
    * built-in column ops — codegen'd, scan-local.
    */
  def decode(tokensCol: Column): Column =
    replace(array_join(tokensCol, ""), lit(BoundaryMarker), lit(" "))

  /** Tokenize: adds `tokens` (array<string>) and `n_tokens` — the
    * token-budget columns downstream packing/mixing consume.
    */
  def tokenize(df: DataFrame, textCol: String, model: BpeModel): DataFrame =
    df.withColumn("tokens", encode(model)(col(textCol)))
      .withColumn("n_tokens", size(col("tokens")))
}
