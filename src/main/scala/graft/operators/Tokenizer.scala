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

  // ---- unigram-LM tokenizer (Kudo 2018 — the SentencePiece unigram
  // model), the other major subword family next to BPE ----

  /** Piece → log-prob vocabulary. Every single code point of the
    * training corpus is retained (never pruned), so encoding any
    * training-charset text is total and the marked round-trip is
    * lossless; unseen code points still segment as themselves at a
    * floor log-prob ([[graft.functions.UnigramCodec.viterbi]]).
    */
  final case class UnigramModel(pieces: Seq[(String, Double)]) {
    require(pieces.nonEmpty, "empty unigram model")
    @transient lazy val lookup: java.util.HashMap[String, java.lang.Double] = {
      val m = new java.util.HashMap[String, java.lang.Double](pieces.size * 2)
      pieces.foreach { case (p, s) => m.putIfAbsent(p, s) }
      m
    }
    @transient lazy val maxLen: Int =
      pieces.iterator.map(p => p._1.codePointCount(0, p._1.length)).max
    @transient lazy val floor: Double = pieces.iterator.map(_._2).min - 10.0
  }

  /** Train a unigram LM vocabulary of ≤ `vocabSize` pieces via
    * Viterbi-EM over the word-count table — the SAME scale shape as
    * [[train]]: the corpus contributes exactly ONE hash aggregate, the
    * driver loop runs on the top-`vocabCap` word rows.
    *
    * Algorithm (Kudo 2018, the deterministic hard-EM variant): seed
    * with every single code point plus the top `seedFactor × vocabSize`
    * word substrings up to `maxPieceLen` code points by occurrence
    * count; `emRounds` rounds of (Viterbi-segment every word → piece
    * counts → re-normalized log-probs); prune to the `vocabSize` most
    * used pieces (single code points are never pruned); one final
    * re-estimation round on the surviving vocabulary. Hard EM's
    * complete-data likelihood is monotone, and every tie in the
    * segmenter, the seeding, and the prune is broken lexicographically
    * — same corpus, same model, independent of partitioning
    * (spec-pinned in UnigramTokenizerSpec).
    */
  def trainUnigram(
      df: DataFrame,
      textCol: String,
      vocabSize: Int,
      vocabCap: Int = 65536,
      maxPieceLen: Int = 8,
      emRounds: Int = 4,
      seedFactor: Int = 4,
      minSeedCount: Long = 2L): UnigramModel = {
    require(vocabSize > 0 && maxPieceLen >= 1 && emRounds >= 1)
    val wordRows = df
      .select(explode(split(col(textCol), " ")).as("word"))
      .filter(col("word") =!= "")
      .groupBy(col("word"))
      .agg(count(lit(1)).as("cnt"))
      .orderBy(col("cnt").desc, col("word"))
      .limit(vocabCap)
      .collect()
    val words = wordRows.map(_.getString(0))
    val wcs = wordRows.map(_.getLong(1))

    // seed: substring counts (weighted by word count)
    val subCounts = new java.util.HashMap[String, Long]()
    var w = 0
    while (w < words.length) {
      val b = graft.functions.UnigramCodec.cpBounds(words(w))
      val n = b.length - 1
      var i = 0
      while (i < n) {
        var j = i + 1
        while (j <= math.min(n, i + maxPieceLen)) {
          subCounts.merge(words(w).substring(b(i), b(j)), wcs(w), (a, x) => a + x)
          j += 1
        }
        i += 1
      }
      w += 1
    }
    val entries = {
      val buf = scala.collection.mutable.ArrayBuffer.empty[(String, Long)]
      subCounts.forEach((p, c) => buf += ((p, c)))
      buf.sortInPlace()(Ordering.by[(String, Long), (Long, String)](e => (-e._2, e._1)))
      buf
    }
    val isSingle = (p: String) => p.codePointCount(0, p.length) == 1
    val singles = entries.filter(e => isSingle(e._1))
    val multis = entries
      .filter(e => !isSingle(e._1) && e._2 >= minSeedCount)
      .take(math.max(0, seedFactor * vocabSize - singles.length))
    var counts: Map[String, Double] =
      (singles ++ multis).map { case (p, c) => p -> c.toDouble }.toMap

    def toModel(cs: Map[String, Double]): UnigramModel = {
      val total = cs.valuesIterator.sum
      UnigramModel(
        cs.toSeq.sortBy(_._1).map { case (p, c) => p -> math.log(c / total) })
    }
    def emRound(m: UnigramModel): Map[String, Double] = {
      val next = new java.util.HashMap[String, Double]()
      var i = 0
      while (i < words.length) {
        val toks = graft.functions.UnigramCodec
          .viterbi(words(i), m.lookup, m.maxLen, m.floor)
        var t = 0
        while (t < toks.length) {
          next.merge(toks(t), wcs(i).toDouble, (a, x) => a + x)
          t += 1
        }
        i += 1
      }
      // singles survive at a half-count floor even when unused — they
      // are the totality guarantee
      val buf = scala.collection.mutable.Map.empty[String, Double]
      counts.keysIterator.foreach { p =>
        val c = next.getOrDefault(p, 0.0)
        if (c > 0.0) buf(p) = c
        else if (isSingle(p)) buf(p) = 0.5
      }
      buf.toMap
    }

    var round = 0
    while (round < emRounds) { counts = emRound(toModel(counts)); round += 1 }
    // prune to vocabSize: singles always kept, multis by usage
    val keptSingles = counts.filter(e => isSingle(e._1))
    val keptMultis = counts.toSeq
      .filter(e => !isSingle(e._1))
      .sortBy(e => (-e._2, e._1))
      .take(math.max(0, vocabSize - keptSingles.size))
    counts = keptSingles ++ keptMultis
    counts = emRound(toModel(counts)) // final re-estimate on survivors
    toModel(counts)
  }

  /** Corpus best-path log-likelihood under `model` (the quantity hard
    * EM improves) — one word-count pass + a driver sum over the bounded
    * table. Diagnostic/spec hook, not a pipeline operator.
    */
  def unigramLogLikelihood(df: DataFrame, textCol: String, model: UnigramModel, vocabCap: Int = 65536): Double = {
    val rows = df
      .select(explode(split(col(textCol), " ")).as("word"))
      .filter(col("word") =!= "")
      .groupBy(col("word"))
      .agg(count(lit(1)).as("cnt"))
      .orderBy(col("cnt").desc, col("word"))
      .limit(vocabCap)
      .collect()
    rows.map { r =>
      val toks = graft.functions.UnigramCodec
        .viterbi(r.getString(0), model.lookup, model.maxLen, model.floor)
      r.getLong(1) * toks.map { t =>
        val s = model.lookup.get(t)
        if (s != null) s.doubleValue() else model.floor
      }.sum
    }.sum
  }

  /** `array<string>` of unigram tokens for `textCol` under `model`. */
  def encodeUnigram(model: UnigramModel)(textCol: Column): Column =
    ColumnBridge.column(
      graft.functions.UnigramEncode(ColumnBridge.expression(textCol), model.pieces))

  /** Marked unigram encode — same lossless round-trip contract (and the
    * same enforced marker precondition) as [[encodeMarked]]; decode is
    * the shared [[decode]].
    */
  def encodeUnigramMarked(model: UnigramModel)(textCol: Column): Column = {
    val encoded = ColumnBridge.column(
      graft.functions.UnigramEncode(
        ColumnBridge.expression(textCol), model.pieces, Some(BoundaryMarker)))
    when(
      textCol.contains(BoundaryMarker),
      raise_error(concat(
        lit("encodeUnigramMarked: input contains the U+0120 boundary " +
          "marker; round-trip would corrupt it. Strip or remap the " +
          "marker before tokenizing: "),
        substring(textCol, 0, 40))).cast("array<string>"))
      .otherwise(encoded)
  }

  /** Unigram tokenize: `tokens` + `n_tokens`, the [[tokenize]] twin. */
  def tokenizeUnigram(df: DataFrame, textCol: String, model: UnigramModel): DataFrame =
    df.withColumn("tokens", encodeUnigram(model)(col(textCol)))
      .withColumn("n_tokens", size(col("tokens")))
}
