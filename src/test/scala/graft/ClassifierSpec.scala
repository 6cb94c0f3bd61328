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
}
