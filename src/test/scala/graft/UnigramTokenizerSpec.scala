package graft

import graft.functions.UnigramCodec
import graft.operators.Tokenizer
import org.apache.spark.sql.functions._

/** Unigram-LM tokenizer contracts (operators/Tokenizer.trainUnigram,
  * functions/UnigramEncode): Viterbi optimality and tie rules, hard-EM
  * likelihood improvement, totality (single code points never pruned →
  * lossless marked round-trip, unseen chars included), determinism, and
  * expression/driver segmentation identity.
  */
class UnigramTokenizerSpec extends SparkSpec {
  import spark.implicits._

  private def lpMap(ps: (String, Double)*): java.util.HashMap[String, java.lang.Double] = {
    val m = new java.util.HashMap[String, java.lang.Double]()
    ps.foreach { case (p, s) => m.put(p, s) }
    m
  }

  test("viterbi picks the max-likelihood split (hand-computed)") {
    // "abc": [abc] = -5; [ab, c] = -1.5 + -2 = -3.5 (best); [a, bc] = -2 + -2.5 = -4.5
    val lp = lpMap("a" -> -2.0, "b" -> -2.2, "c" -> -2.0,
      "ab" -> -1.5, "bc" -> -2.5, "abc" -> -5.0)
    assert(UnigramCodec.viterbi("abc", lp, 3, -20.0).toSeq == Seq("ab", "c"))
  }

  test("viterbi exact ties prefer the longer trailing piece; unknown singles take floor") {
    // [ab] = -4 exactly equals [a, b] = -2 + -2: the single piece wins
    val lp = lpMap("a" -> -2.0, "b" -> -2.0, "ab" -> -4.0)
    assert(UnigramCodec.viterbi("ab", lp, 2, -20.0).toSeq == Seq("ab"))
    // 'x' unknown: segments as itself at floor, never fails
    assert(UnigramCodec.viterbi("axb", lp, 2, -20.0).toSeq == Seq("a", "x", "b"))
    // surrogate-pair code point stays intact as one fallback token
    assert(UnigramCodec.viterbi("a😀b", lp, 2, -20.0).toSeq ==
      Seq("a", "😀", "b"))
  }

  private lazy val corpus = {
    // repetitive multi-word docs so multi-char pieces earn their keep
    val words = Vector("internationalization", "international", "nation",
      "the", "of", "tokenizer", "tokens", "token")
    (0 until 400)
      .map { i =>
        val ws = (0 until 12).map(j => words((i * 7 + j * 13) % words.length))
        (i.toLong, ws.mkString(" "))
      }
      .toDF("doc_id", "text")
  }

  test("hard EM does not decrease corpus best-path likelihood; pieces beat chars") {
    val charsOnly = {
      // char-level baseline model: uniform over observed singles
      val chars = corpus.collect().flatMap(_.getString(1).split(" "))
        .flatMap(_.toCharArray.map(_.toString)).distinct.sorted
      Tokenizer.UnigramModel(chars.map(c => c -> math.log(1.0 / chars.length)).toIndexedSeq)
    }
    val model = Tokenizer.trainUnigram(corpus, "text", vocabSize = 120, emRounds = 4)
    val llChars = Tokenizer.unigramLogLikelihood(corpus, "text", charsOnly)
    val llModel = Tokenizer.unigramLogLikelihood(corpus, "text", model)
    assert(llModel > llChars, s"model $llModel vs char baseline $llChars")
    // frequent whole words become single pieces
    val ps = model.pieces.map(_._1).toSet
    assert(ps.contains("the") || ps.contains("nation"), ps.take(30).toString)
  }

  test("every single code point survives training; vocab respects the cap") {
    val model = Tokenizer.trainUnigram(corpus, "text", vocabSize = 60)
    val singles = corpus.collect().flatMap(_.getString(1).split(" "))
      .flatMap(w => { val b = UnigramCodec.cpBounds(w)
        (0 until b.length - 1).map(i => w.substring(b(i), b(i + 1))) }).toSet
    val ps = model.pieces.map(_._1).toSet
    assert(singles.subsetOf(ps), (singles -- ps).toString)
    assert(model.pieces.size <= 60 + singles.size)
  }

  test("marked round-trip is lossless, including runs of spaces and unseen chars") {
    val model = Tokenizer.trainUnigram(corpus, "text", vocabSize = 120)
    val tricky = Seq(
      (1L, "the international tokenizer"),
      (2L, "  leading and  double  spaces "),
      (3L, "unseen: ZH😀!"),
      (4L, ""))
      .toDF("doc_id", "text")
    val back = tricky
      .select(col("doc_id"),
        Tokenizer.decode(Tokenizer.encodeUnigramMarked(model)(col("text"))).as("rt"),
        col("text"))
      .collect()
    back.foreach(r => assert(r.getString(1) == r.getString(2), r.toString))
  }

  test("training is deterministic and the expression matches driver viterbi") {
    val m1 = Tokenizer.trainUnigram(corpus, "text", vocabSize = 100)
    val m2 = Tokenizer.trainUnigram(corpus, "text", vocabSize = 100)
    assert(m1.pieces == m2.pieces)
    val viaExpr = corpus.limit(20)
      .select(col("doc_id"), Tokenizer.encodeUnigram(m1)(col("text")).as("t"))
      .orderBy("doc_id").collect()
      .map(r => r.getLong(0) -> r.getSeq[String](1))
    val viaDriver = corpus.limit(20).orderBy("doc_id").collect().map { r =>
      r.getLong(0) -> r.getString(1).split(" ", -1).toSeq
        .flatMap(w => UnigramCodec.viterbi(w, m1.lookup, m1.maxLen, m1.floor))
    }
    assert(viaExpr.toSeq.map(x => x._1 -> x._2.toList) ==
      viaDriver.toSeq.map(x => x._1 -> x._2.toList))
  }
}
