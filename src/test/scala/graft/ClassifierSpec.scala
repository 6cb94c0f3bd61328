package graft

import graft.operators.Classifier
import org.apache.spark.sql.functions._

/** Hashed-feature logistic regression (operators/Classifier.scala).
  * Training is gradient-descent float math with no cross-engine
  * mirror, so these specs ARE its gate: separability on a labeled
  * fixture, bit-determinism of the fit, and the closed-form score
  * identity the q_classifier_score oracle relies on.
  */
class ClassifierSpec extends SparkSpec {

  import spark.implicits._

  private lazy val labeled = {
    val rows = (0 until 240).map { i =>
      val pos = i % 2 == 0
      val words =
        if (pos) Seq.tabulate(20)(j => Seq("helpful", "accurate", "sourced", "clear")((i + j) % 4))
        else Seq.tabulate(20)(j => Seq("scam", "free", "winner", "claim", "prize")((i + j) % 5))
      (i.toLong, words.mkString(" "), if (pos) 1 else 0)
    }
    rows.toDF("doc_id", "text", "label")
  }

  private lazy val model =
    Classifier.train(labeled, "doc_id", "text", "label", buckets = 128, epochs = 25)

  test("train separates a disjoint-vocabulary fixture") {
    val scored = labeled
      .withColumn("p", Classifier.score(col("text"), model))
      .select(col("label"), (col("p") > 0.5).cast("int").as("pred"))
      .collect()
    val acc = scored.count(r => r.getInt(0) == r.getInt(1)).toDouble / scored.length
    assert(acc >= 0.99, s"in-sample accuracy $acc < 0.99 on a separable fixture")
  }

  test("training is deterministic: two fits produce identical weights") {
    val again = Classifier.train(labeled, "doc_id", "text", "label", buckets = 128, epochs = 25)
    assert(again.bias == model.bias)
    assert(again.weights.sameElements(model.weights))
  }

  test("score matches the closed-form sigmoid of the hashed count-share dot product") {
    // one doc, weights chosen by formula — recompute the score by hand
    // through the same md5 bucketing the engine uses
    val buckets = 32
    val w = Array.tabulate(buckets)(b => (b % 7) / 10.0 - 0.3)
    val m = Classifier.HashedLogReg(bias = 0.25, weights = w, buckets = buckets)
    val text = "one two three two one"
    def bucketOf(tok: String): Int = {
      val hex = java.security.MessageDigest
        .getInstance("MD5")
        .digest(tok.getBytes("UTF-8"))
        .map("%02x".format(_))
        .mkString
      (java.lang.Long.parseLong(hex.substring(0, 8), 16) % buckets).toInt
    }
    val toks = text.split(" ")
    val expected = 1.0 / (1.0 + math.exp(-(0.25 + toks.map(t => w(bucketOf(t))).sum / toks.length)))
    val got = Seq((1L, text))
      .toDF("doc_id", "text")
      .select(Classifier.score(col("text"), m).as("p"))
      .head()
      .getDouble(0)
    assert(math.abs(got - expected) < 1e-12, s"$got vs $expected")
  }

  test("trained weights load the vocabulary buckets, not the hash noise") {
    // every positive-vocabulary bucket should carry positive weight,
    // negative vocabulary negative — the model learned the words
    val posBuckets = Seq("helpful", "accurate", "sourced", "clear")
    val negBuckets = Seq("scam", "free", "winner", "claim", "prize")
    def bucketOf(tok: String): Int = {
      val hex = java.security.MessageDigest
        .getInstance("MD5")
        .digest(tok.getBytes("UTF-8"))
        .map("%02x".format(_))
        .mkString
      (java.lang.Long.parseLong(hex.substring(0, 8), 16) % 128).toInt
    }
    posBuckets.foreach { t =>
      assert(model.weights(bucketOf(t)) > 0.0, s"weight for '$t' not positive")
    }
    negBuckets.foreach { t =>
      assert(model.weights(bucketOf(t)) < 0.0, s"weight for '$t' not negative")
    }
  }

  // ---- evaluation: exact AUC + calibration bins -------------------------

  private def aucOf(rows: Seq[(Double, Int)], coarse: Int = 4096): (Option[Double], Long, Long) = {
    val df = rows.toDF("s", "y")
    val r = Classifier.auc(df, "s", "y", coarseBuckets = coarse).head()
    (if (r.isNullAt(0)) None else Some(r.getDouble(0)), r.getLong(1), r.getLong(2))
  }

  test("auc: hand-computed tie case (Mann-Whitney with average ranks)") {
    // scores: pos at {0.8, 0.4}, neg at {0.4, 0.2}
    // pairs: (0.8 vs 0.4)=1, (0.8 vs 0.2)=1, (0.4 vs 0.4)=0.5, (0.4 vs 0.2)=1
    // AUC = 3.5 / 4 = 0.875
    val (auc, p, n) = aucOf(Seq((0.8, 1), (0.4, 1), (0.4, 0), (0.2, 0)))
    assert(auc.contains(0.875) && p == 2 && n == 2, s"got $auc $p/$n")
  }

  test("auc: perfect separation is 1, reversed is 0, constant scores are 0.5") {
    assert(aucOf(Seq((0.9, 1), (0.8, 1), (0.2, 0), (0.1, 0)))._1.contains(1.0))
    assert(aucOf(Seq((0.1, 1), (0.2, 1), (0.8, 0), (0.9, 0)))._1.contains(0.0))
    assert(aucOf(Seq((0.5, 1), (0.5, 0), (0.5, 1), (0.5, 0)))._1.contains(0.5))
  }

  test("auc: single-class input returns null with honest counts") {
    val (auc, p, n) = aucOf(Seq((0.9, 1), (0.4, 1)))
    assert(auc.isEmpty && p == 2 && n == 0)
  }

  test("auc is invariant to the coarse bucketing (including one bucket) and matches a driver reference") {
    val rnd = new scala.util.Random(11)
    val rows = (0 until 500).map { _ =>
      val y = rnd.nextInt(2)
      // overlapping but shifted distributions + heavy ties via 2-dp rounding
      val s = math.rint((rnd.nextDouble() * 0.8 + y * 0.2) * 100) / 100.0
      (s, y)
    }
    // driver reference: pairwise count
    val pos = rows.filter(_._2 == 1).map(_._1)
    val neg = rows.filter(_._2 == 0).map(_._1)
    val wins = (for (a <- pos; b <- neg)
      yield if (a > b) 1.0 else if (a == b) 0.5 else 0.0).sum
    val ref = math.rint(wins / (pos.size * neg.size) * 1e6) / 1e6
    for (c <- Seq(1, 7, 4096)) {
      val (auc, _, _) = aucOf(rows, coarse = c)
      assert(auc.contains(ref), s"coarse=$c: ${auc} vs driver $ref")
    }
  }

  test("trained model AUC beats 0.95 on the separable fixture (q_classifier_auc_trained's pin)") {
    // PlanGuardSpec sweeps the gated/benched auc plans for the
    // partition-less-window and sort-aggregate prohibitions
    val scored = labeled.select(
      round(Classifier.score(col("text"), model), 6).as("s"), col("label"))
    val auc = Classifier.auc(scored, "s", "label").head().getDouble(0)
    assert(auc > 0.95, s"trained AUC $auc")
  }

  test("calibration bins: counts, decimal-exact means, clamped edge bins") {
    val rows = Seq((0.05, 0), (0.12, 0), (0.18, 1), (1.0, 1), (-0.2, 0))
    val out = Classifier.calibrationBins(rows.toDF("s", "y"), "s", "y", bins = 10)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2), r.getDouble(3)))
    // bin 0: {0.05, -0.2} (clamp below); bin 1: {0.12, 0.18}; bin 9: {1.0} (clamp above)
    assert(out.toSeq == Seq(
      (0L, 2L, math.rint((0.05 - 0.2) / 2 * 1e6) / 1e6, 0.0),
      (1L, 2L, 0.15, 0.5),
      (9L, 1L, 1.0, 1.0)), s"got ${out.toSeq}")
  }
}
