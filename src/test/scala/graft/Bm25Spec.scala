package graft

import graft.operators.TextAnalysis
import org.apache.spark.sql.functions._

/** BM25 retrieval against closed-form scores (Lucene variant:
  * idf = ln((N - df + 0.5)/(df + 0.5) + 1)).
  */
class Bm25Spec extends SparkSpec {

  private def corpus = {
    import spark.implicits._
    Seq(
      (1L, "apple banana apple"),
      (2L, "banana cherry"),
      (3L, "cherry cherry cherry")
    ).toDF("doc_id", "text")
  }

  private def queries(qs: (Long, String)*) = {
    import spark.implicits._
    qs.toDF("query_id", "qtext")
  }

  private def bm25(score: Map[String, (Long, Double)], dl: Double): Double = {
    // plain-Scala twin of the operator formula
    val n = 3.0; val avgdl = 8.0 / 3.0; val k1 = 1.2; val b = 0.75
    score.map { case (_, (tf, df)) =>
      val idf = math.log((n - df + 0.5) / (df + 0.5) + 1.0)
      idf * (tf * (k1 + 1.0)) / (tf + k1 * (1.0 - b + b * dl / avgdl))
    }.sum
  }

  test("scores match the closed form and rank by rounded score + id") {
    val out = TextAnalysis
      .bm25TopK(corpus, queries((10L, "apple cherry")), "doc_id", "text",
        "query_id", "qtext", topK = 10)
      .orderBy(col("rank"))
      .collect()
    // d1: apple tf=2 df=1; d2: cherry tf=1 df=2; d3: cherry tf=3 df=2
    val expected = Map(
      1L -> bm25(Map("apple" -> ((2L, 1.0))), dl = 3.0),
      2L -> bm25(Map("cherry" -> ((1L, 2.0))), dl = 2.0),
      3L -> bm25(Map("cherry" -> ((3L, 2.0))), dl = 3.0)
    )
    assert(out.length == 3)
    out.foreach { r =>
      val id = r.getAs[Long]("doc_id")
      // Spark round() is HALF_UP — mirror it exactly
      val exp = BigDecimal(expected(id))
        .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
      assert(math.abs(r.getAs[Double]("score") - exp) < 1e-9, s"doc $id")
    }
    // apple is rarer (df=1) and d1 carries it twice → d1 first; the two
    // cherry docs order by their tf saturation
    assert(out.map(_.getAs[Long]("doc_id")).toSeq == Seq(1L, 3L, 2L))
  }

  test("topK truncates per query and query terms dedupe") {
    val out = TextAnalysis
      .bm25TopK(corpus, queries((1L, "cherry cherry"), (2L, "banana")),
        "doc_id", "text", "query_id", "qtext", topK = 1)
      .collect()
    // one row per query; duplicated query term scores once
    assert(out.length == 2)
    val q1 = out.find(_.getAs[Long]("query_id") == 1L).get
    assert(q1.getAs[Long]("doc_id") == 3L) // highest cherry tf wins
    val single = TextAnalysis
      .bm25TopK(corpus, queries((9L, "cherry")), "doc_id", "text",
        "query_id", "qtext", topK = 1)
      .collect().head
    assert(q1.getAs[Double]("score") == single.getAs[Double]("score"))
  }

  test("disjoint query retrieves nothing") {
    val out = TextAnalysis
      .bm25TopK(corpus, queries((1L, "durian")), "doc_id", "text",
        "query_id", "qtext", topK = 5)
      .collect()
    assert(out.isEmpty)
  }

  test("persisted index round-trips: serve-from-parquet equals one-shot") {
    val dir = java.nio.file.Files.createTempDirectory("graft_bm25_idx").toString
    val built = TextAnalysis.bm25Index(corpus, "doc_id", "text")
    // the production cadence: index written once (tf bucketed on term
    // for exchange-free serve joins), query batches served from disk
    built.tf.write.mode("overwrite").parquet(s"$dir/tf")
    built.dfreq.write.mode("overwrite").parquet(s"$dir/dfreq")
    built.stats.write.mode("overwrite").parquet(s"$dir/stats")
    val reread = TextAnalysis.Bm25Index(
      spark.read.parquet(s"$dir/tf"),
      spark.read.parquet(s"$dir/dfreq"),
      spark.read.parquet(s"$dir/stats"),
      "doc_id")
    val q = queries((10L, "apple cherry"), (11L, "banana"))
    val served = TextAnalysis
      .bm25Serve(reread, q, "query_id", "qtext", topK = 10)
      .orderBy("query_id", "rank").collect()
    val oneShot = TextAnalysis
      .bm25TopK(corpus, q, "doc_id", "text", "query_id", "qtext", topK = 10)
      .orderBy("query_id", "rank").collect()
    assert(served.toSeq === oneShot.toSeq)
    assert(served.nonEmpty)
  }
}
