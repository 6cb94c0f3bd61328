package graft

import graft.operators.Selection
import org.apache.spark.sql.functions._

/** DSIR importance resampling + temperature mixture sampling
  * (operators/Selection.scala). The cross-engine value gates live in
  * SelectionQueries' oracles; these pin the SEMANTIC properties no
  * hash-compare can see — that the weights actually separate the
  * target domain, that resampling follows the weights, and that the
  * temperature knob moves the mixture the direction the math says.
  */
class SelectionSpec extends SparkSpec {

  import spark.implicits._

  // two word distributions: target-ish docs draw from mostly-disjoint
  // vocabulary so the hashed-bigram model has real signal
  private lazy val corpus = {
    val rows = (0 until 300).map { i =>
      val target = i % 3 == 0
      val words =
        if (target) Seq.tabulate(30)(j => Seq("clean", "prose", "cited", "edited")((i + j) % 4))
        else Seq.tabulate(30)(j => Seq("spam", "lorem", "click", "now", "buy")((i + j) % 5))
      (i.toLong, words.mkString(" "), target)
    }
    rows.toDF("doc_id", "text", "is_target")
  }

  test("dsir weights separate the target domain") {
    val scored = Selection
      .dsirScore(corpus, "doc_id", "text", col("is_target"), buckets = 512, n = 2)
      .join(corpus.select("doc_id", "is_target"), "doc_id")
    val avg = scored
      .groupBy(col("is_target"))
      .agg(org.apache.spark.sql.functions.avg(col("dsir_weight")).as("m"))
      .collect()
      .map(r => r.getBoolean(0) -> r.getDouble(1))
      .toMap
    assert(avg(true) > 0.0, s"target mean ${avg(true)} should be positive")
    assert(avg(false) < 0.0, s"raw-only mean ${avg(false)} should be negative")
    assert(avg(true) - avg(false) > 5.0, s"separation ${avg(true) - avg(false)} too small")
  }

  test("dsir weight of a doc equals the sum of its bucket log-ratios (hand check)") {
    // two one-bigram docs: one target, one not — the weight must be
    // exactly ln((tc+1)/(tt+B)) - ln((rc+1)/(rt+B)) for its bucket
    val tiny = Seq(
      (1L, "alpha beta", true),
      (2L, "gamma delta", false)
    ).toDF("doc_id", "text", "is_target")
    val b = 64
    val w = Selection
      .dsirScore(tiny, "doc_id", "text", col("is_target"), buckets = b, n = 2)
      .collect()
      .map(r => r.getLong(0) -> r.getDouble(2))
      .toMap
    // doc 1's bigram: tc=1, rc=1 of tt=1, rt=2
    val w1 = math.log(2.0 / (1 + b)) - math.log(2.0 / (2 + b))
    // doc 2's bigram: tc=0, rc=1
    val w2 = math.log(1.0 / (1 + b)) - math.log(2.0 / (2 + b))
    assert(math.abs(w(1L) - w1) < 1e-6, s"${w(1L)} vs $w1")
    assert(math.abs(w(2L) - w2) < 1e-6, s"${w(2L)} vs $w2")
  }

  test("xxhash64 production family preserves the domain separation (different buckets, same signal)") {
    val scored = Selection
      .dsirScore(corpus, "doc_id", "text", col("is_target"), buckets = 512, n = 2,
        family = graft.operators.HashFamily.XxHash64)
      .join(corpus.select("doc_id", "is_target"), "doc_id")
    val avg = scored
      .groupBy(col("is_target"))
      .agg(org.apache.spark.sql.functions.avg(col("dsir_weight")).as("m"))
      .collect()
      .map(r => r.getBoolean(0) -> r.getDouble(1))
      .toMap
    assert(avg(true) > 0.0 && avg(false) < 0.0 && avg(true) - avg(false) > 5.0,
      s"xx family lost the separation: ${avg(true)} vs ${avg(false)}")
  }

  test("native HashedGramFold is value-identical to the composed lambda fold (both families, edges)") {
    // edge zoo: empty string, single word, doc shorter than n, double/
    // leading/trailing spaces (empty words), unicode multibyte words,
    // plus a deterministic word-salad sweep
    val rnd = new scala.util.Random(7)
    val vocab = Seq("alpha", "beta", "γάμμα", "delta", "ε", "zeta2", "η…θ")
    val texts = Seq(
      "",
      "one",
      "one two",
      "a  b",
      " lead",
      "trail ",
      "naïve café über señor",
      "x " * 5 + "x"
    ) ++ (0 until 40).map(_ => Seq.fill(1 + rnd.nextInt(30))(vocab(rnd.nextInt(vocab.size))).mkString(" "))
    val df = texts.zipWithIndex.map { case (t, i) => (i.toLong, t) }.toDF("doc_id", "text")
    val table = Array.tabulate(64)(b => (b % 13) / 10.0 - 0.6)
    for (fam <- Seq(graft.operators.HashFamily.Md5, graft.operators.HashFamily.XxHash64);
         n <- Seq(1, 2, 3)) {
      val both = df.select(
        Selection.hashedGramFold(col("text"), n, 64, table, fam).as("native"),
        graft.operators.Selection
          .hashedGramFoldComposed(col("text"), n, 64, table, fam)
          .as("composed")
      ).collect()
      both.zipWithIndex.foreach { case (r, i) =>
        assert(r.getDouble(0) == r.getDouble(1),
          s"family=$fam n=$n text[$i]=${texts(i).take(40)}: ${r.getDouble(0)} vs ${r.getDouble(1)}")
      }
    }
  }

  test("gumbel top-k selects mostly high-weight rows and is deterministic") {
    val weights = Selection.dsirScore(corpus, "doc_id", "text", col("is_target"), 512, 2)
    val sel = Selection.gumbelTopK(weights, "doc_id", "dsir_weight", k = 60, temperature = 1.0)
    val selected = sel.select("doc_id").as[Long].collect().toSet
    assert(selected.size == 60)
    val targetHits = corpus
      .filter(col("is_target") && col("doc_id").isin(selected.toSeq: _*))
      .count()
    // 100 of 300 docs are target; weight-proportional selection at T=1
    // over a >5-nat gap should pick nearly only target docs
    assert(targetHits >= 55, s"only $targetHits/60 selected docs are target-domain")
    val again = Selection
      .gumbelTopK(weights, "doc_id", "dsir_weight", k = 60, temperature = 1.0)
      .select("doc_id").as[Long].collect().toSet
    assert(again == selected, "same seed must select the same set")
  }

  test("gumbel top-frac keeps ~frac of rows, overrepresents high weights, deterministic") {
    val weights = Selection.dsirScore(corpus, "doc_id", "text", col("is_target"), 512, 2)
    val kept = Selection.gumbelTopFrac(weights, "doc_id", "dsir_weight", frac = 0.4)
    val n = kept.count()
    assert(math.abs(n - 120L) <= 12, s"kept $n of 300, expected ~120")
    val targetShare = kept
      .join(corpus.select("doc_id", "is_target"), "doc_id")
      .filter(col("is_target"))
      .count()
      .toDouble / n
    // targets are 1/3 of the corpus but carry a >5-nat weight edge
    assert(targetShare > 0.6, s"target share $targetShare should exceed the 1/3 base rate")
    val again = Selection.gumbelTopFrac(weights, "doc_id", "dsir_weight", frac = 0.4)
      .select("doc_id").as[Long].collect().toSet
    assert(again == kept.select("doc_id").as[Long].collect().toSet)
  }

  test("temperature rates: alpha=1 is the natural mixture, alpha→0 flattens") {
    val df = (0 until 400)
      .map(i => (i.toLong, if (i % 4 == 0) "small" else "large"))
      .toDF("doc_id", "domain")
    def rate(alpha: Double): Map[String, Double] =
      Selection
        .temperatureRates(df, "domain", alpha)
        .collect()
        .map(r => r.getString(0) -> r.getDouble(2))
        .toMap
    val natural = rate(1.0)
    assert(natural("large") == 1.0)
    assert(math.abs(natural("small") - 100.0 / 300.0) < 1e-6)
    val flat = rate(0.1)
    assert(flat("small") > natural("small"), "small alpha must lift the small domain")
    assert(flat("small") > 0.85, s"alpha=0.1 should nearly flatten, got ${flat("small")}")
  }

  test("temperature sample keeps the large domain whole and subsamples the rest at ~rate") {
    val df = (0 until 4000)
      .map(i => (i.toLong, if (i % 4 == 0) "small" else "large"))
      .toDF("doc_id", "domain")
    val kept = Selection
      .temperatureSample(df, "doc_id", "domain", alpha = 0.3)
      .groupBy("domain")
      .count()
      .collect()
      .map(r => r.getString(0) -> r.getLong(1))
      .toMap
    assert(kept("large") == 3000L, "rate-1 domain must pass through whole")
    val expectedSmall = math.pow(1.0 / 3.0, 0.3) * 1000 // rate vs large
    assert(
      math.abs(kept("small") - expectedSmall) < 60,
      s"small kept ${kept("small")} vs expected ~$expectedSmall"
    )
  }
}
