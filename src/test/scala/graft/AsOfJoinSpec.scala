package graft

import graft.operators.{AsOfJoin, Dedup, TextAnalysis}
import org.apache.spark.sql.functions._

import java.sql.Timestamp

/** AsOfJoin semantics + the substring-dup and gopher-rules signals. */
class AsOfJoinSpec extends SparkSpec {
  import spark.implicits._

  private def t(s: String) = Timestamp.valueOf(s)

  private val quotes = Seq(
    ("X", t("2024-01-01 00:00:01"), 10.0),
    ("X", t("2024-01-01 00:00:05"), 11.0),
    ("X", t("2024-01-01 00:00:09"), 12.0),
    ("Y", t("2024-01-01 00:00:03"), 20.0)
  ).toDF("sym", "qts", "bid")
    .select($"sym", $"qts", $"qts".as("quote_ts"), $"bid")

  private val trades = Seq(
    ("X", t("2024-01-01 00:00:00"), 1L), // before any quote -> null
    ("X", t("2024-01-01 00:00:05"), 2L), // exactly at a quote -> that quote wins
    ("X", t("2024-01-01 00:00:07"), 3L), // between quotes -> 00:05 quote
    ("Z", t("2024-01-01 00:00:04"), 4L)  // key with no quotes at all
  ).toDF("sym", "tts", "trade_id")

  test("as-of picks the latest right at-or-before each left row, per key") {
    val out = AsOfJoin
      .asOf(trades, quotes, Seq("sym"), "tts", "qts", Seq("quote_ts", "bid"))
      .orderBy($"trade_id")
      .collect()
    assert(out.map(r => Option(r.getAs[Any]("bid"))).toSeq ==
      Seq(None, Some(11.0), Some(11.0), None))
    assert(out(1).getAs[Timestamp]("quote_ts") == t("2024-01-01 00:00:05"))
  }

  test("tolerance nulls out stale matches but keeps the left row") {
    val out = AsOfJoin
      .asOf(trades, quotes, Seq("sym"), "tts", "qts", Seq("bid"),
        toleranceSeconds = Some(1L))
      .orderBy($"trade_id")
      .collect()
    // trade 3 at 00:07 matched the 00:05 quote — 2s stale > 1s tolerance
    assert(out.length == 4)
    assert(Option(out(2).getAs[Any]("bid")).isEmpty)
    assert(Option(out(1).getAs[Any]("bid")).contains(11.0)) // 0s stale survives
  }

  test("duplicate right rows at one (key, ts) resolve to the greatest payload") {
    // three quotes at the SAME instant: the winner must be the max
    // payload struct (bid 30.0), every run — not partition-order luck
    val dupQuotes = Seq(
      ("X", t("2024-01-01 00:00:05"), 10.0),
      ("X", t("2024-01-01 00:00:05"), 30.0),
      ("X", t("2024-01-01 00:00:05"), 20.0)
    ).toDF("sym", "qts", "bid")
    val trade = Seq(("X", t("2024-01-01 00:00:06"), 1L)).toDF("sym", "tts", "trade_id")
    (1 to 5).foreach { i =>
      val bid = AsOfJoin
        .asOf(trade, dupQuotes.repartition(8), Seq("sym"), "tts", "qts", Seq("bid"))
        .select($"bid").as[Double].head()
      assert(bid == 30.0, s"run $i picked $bid, not the greatest payload")
    }
  }

  test("plan is one keyed window over a union — no join operator at all") {
    val out = AsOfJoin.asOf(trades, quotes, Seq("sym"), "tts", "qts", Seq("bid"))
    out.collect() // finalize the AQE plan before inspecting it
    // executedPlan.toString prints Final AND Initial AQE plans — judge
    // the final one only
    val plan = out.queryExecution.executedPlan.toString.split("== Initial Plan ==")(0)
    assert(plan.contains("Window"), s"expected a Window operator:\n$plan")
    assert(plan.linesIterator.count(_.contains("+- Exchange")) == 1,
      s"as-of must shuffle exactly once:\n$plan")
    assert(!plan.contains("Join"), s"as-of must not plan a join:\n$plan")
  }

  test("collision with left column names is rejected loudly") {
    val clash = quotes.withColumnRenamed("bid", "trade_id")
    intercept[IllegalArgumentException] {
      AsOfJoin.asOf(trades, clash, Seq("sym"), "tts", "qts", Seq("trade_id"))
    }
  }

  test("substringDupStats marks cross-doc spans, not within-doc repeats") {
    val docs = Seq(
      // docs 1 and 2 share a verbatim 10-token run; doc 3 repeats ITS OWN
      // span twice (min==max -> not shared); doc 4 is too short for any window
      (1L, "a b c d e f g h i j unique one tail"),
      (2L, "prefix a b c d e f g h i j other tail"),
      (3L, "r s t u v w x y z q r s t u v w x y z q"),
      (4L, "too short")
    ).toDF("doc_id", "text")
    val out = Dedup.substringDupStats(docs, "doc_id", "text")
      .orderBy($"doc_id").collect()
    assert(out(0).getAs[Long]("n_dup") > 0, "doc 1 shares a span with doc 2")
    assert(out(1).getAs[Long]("n_dup") > 0)
    assert(out(2).getAs[Long]("n_dup") == 0, "self-repeats are not cross-doc dups")
    assert(out(3).getAs[Long]("n_windows") == 0 &&
      out(3).getAs[Double]("dup_fraction") == 0.0)
  }

  test("native WindowHashes is value-identical to the composed split+transform form") {
    import graft.operators.HashFamily
    val tricky = Seq(
      "a b c d e f g h i j k l",           // normal, 3 windows
      "  leading spaces a b c d e f g h",  // leading empty token
      "exactly ten tokens one two three four five six seven",
      "too short",
      "",                                   // empty text
      "müller straße ümlaut ö ü ä ß é ç ñ multibyte chars here" // multibyte
    ).zipWithIndex.map { case (s, i) => (i.toLong, s) }.toDF("doc_id", "text")
    for (family <- Seq(HashFamily.Md5, HashFamily.XxHash64); stride <- Seq(1, 3)) {
      val native = org.apache.spark.sql.graftbridge.ColumnBridge.column(
        graft.functions.WindowHashes(
          org.apache.spark.sql.graftbridge.ColumnBridge.expression($"text"),
          10, stride, family == HashFamily.Md5))
      val composed = Dedup.substringWindowHashesComposed($"text", 10, stride, family)
      val diff = tricky
        .select($"doc_id", native.as("n"), composed.as("c"))
        .filter(not($"n" <=> $"c"))
        .count()
      assert(diff == 0, s"family=$family stride=$stride diverged")
    }
  }

  test("content-defined sampling detects dups across copies at ANY offset parity") {
    import graft.operators.HashFamily
    // the shared 12-token run starts at token 1 in doc 1 and token 2 in
    // doc 2 (opposite parity) — a positional stride-2 sampler can pick
    // disjoint windows from the two copies; hash-mod sampling cannot
    val docs = Seq(
      (1L, "a b c d e f g h i j k l"),
      (2L, "x a b c d e f g h i j k l")
    ).toDF("doc_id", "text")
    val out = Dedup.substringDupStats(docs, "doc_id", "text",
      family = HashFamily.XxHash64, sampleMod = Some(2))
      .orderBy($"doc_id").collect()
    assert(out.forall(_.getAs[Long]("n_dup") > 0),
      "both copies of the run must be flagged under content-defined sampling")
    // sampling needs numeric hashes: the md5 family rejects it loudly
    intercept[IllegalArgumentException] {
      Dedup.substringDupStats(docs, "doc_id", "text", sampleMod = Some(2))
    }
  }

  test("substringDupSpans merges overlapping shared windows into maximal extents") {
    // doc 2 contains doc 1's full 12-token run → its windows overlap
    // chain-wise and must merge into ONE span covering the run
    val docs = Seq(
      (1L, "a b c d e f g h i j k l"),
      (2L, "x y a b c d e f g h i j k l z")
    ).toDF("doc_id", "text")
    val spans = Dedup.substringDupSpans(docs, "doc_id", "text")
      .orderBy($"doc_id").collect()
    assert(spans.length == 2)
    assert(spans(0).getAs[Long]("span_start") == 1 && spans(0).getAs[Long]("span_end") == 12)
    assert(spans(1).getAs[Long]("span_start") == 3 && spans(1).getAs[Long]("span_end") == 14)
  }

  test("stripDuplicatedSpans cuts only the non-canonical copies") {
    val docs = Seq(
      (1L, "a b c d e f g h i j k l"),            // canonical (smallest id) — intact
      (2L, "x y a b c d e f g h i j k l z"),      // loses the copied run, keeps x y z
      (3L, "totally unrelated text with no duplicate content at all here")
    ).toDF("doc_id", "text")
    val out = Dedup.stripDuplicatedSpans(docs, "doc_id", "text")
      .orderBy($"doc_id").collect()
    assert(out(0).getAs[String]("stripped_text") == "a b c d e f g h i j k l")
    assert(out(0).getAs[Long]("n_removed") == 0)
    assert(out(1).getAs[String]("stripped_text") == "x y z")
    assert(out(1).getAs[Long]("n_removed") == 12)
    assert(out(2).getAs[Long]("n_removed") == 0)
  }

  test("native GopherCounters is value-identical to the composed six-pass form") {
    val tricky = Seq(
      "the quick brown fox and the lazy dog with more text to fill",
      "  leading and trailing whitespace  ",
      "#### symbols ... everywhere ...... and .... partial dots ..",
      "text ending in exactly three dots...",
      "...",
      "THE Of AnD case insensitive stop words",
      "no1 a1pha 123 456 !!! ???",
      "",
      "   ",
      "müller straße ümlaut the ö ü of ä ß é multibyte",
      "tabs\tand\nnewlinesmixed\fwhite\rspace the of"
    ).zipWithIndex.map { case (s, i) => (i.toLong, s) }.toDF("doc_id", "text")
    val native = TextAnalysis.gopherRules(tricky, "doc_id", "text")
    val composed = TextAnalysis.gopherRulesComposed(tricky, "doc_id", "text")
    assert(native.exceptAll(composed).count() == 0 &&
      composed.exceptAll(native).count() == 0,
      "native and composed gopher metrics diverged")
  }

  test("native TextSignals langId/qualityScore match their composed twins") {
    import graft.operators.TextAnalysis
    val tricky = Seq(
      "the cat and the dog of a to",                  // en
      "la vie et le la les des",                      // fr beats es on "la" overlap
      "el que la y los",                              // es
      "der und nicht das die",                        // de
      "no markers at all here",                       // tie -> largest code wins
      "",                                             // empty
      "  double  spaces  the  of ",                   // empty tokens
      "müller straße the of multibyte"
    ).zipWithIndex.map { case (s, i) => (i.toLong, s) }.toDF("doc_id", "text")
    val both = tricky.select(
      $"doc_id",
      TextAnalysis.langId($"text").as("ln"),
      TextAnalysis.langIdComposed($"text").as("lc"),
      TextAnalysis.qualityScore($"text").as("qn"),
      TextAnalysis.qualityScoreComposed($"text").as("qc"))
    val bad = both.filter(not($"ln" <=> $"lc") || not($"qn" <=> $"qc")).collect()
    assert(bad.isEmpty, s"diverged rows: ${bad.mkString(", ")}")
  }

  test("gopherRules: each named rule gates independently") {
    val docs = Seq(
      (1L, ("the quick brown fox jumps over and over with energy " * 4).trim), // passes
      (2L, "the of and"), // fails word_count
      (3L, ("#### #### #### " * 12 + "the and of steady words go here " * 4).trim) // fails symbol ratio
    ).toDF("doc_id", "text")
    val out = TextAnalysis.gopherRules(docs, "doc_id", "text")
      .orderBy($"doc_id").collect()
    assert(out(0).getAs[Boolean]("pass"))
    assert(!out(1).getAs[Boolean]("rule_word_count") && !out(1).getAs[Boolean]("pass"))
    assert(!out(2).getAs[Boolean]("rule_symbol_ratio") && !out(2).getAs[Boolean]("pass"))
    assert(out(2).getAs[Boolean]("rule_stopwords"), "stopwords still present in doc 3")
  }
}
