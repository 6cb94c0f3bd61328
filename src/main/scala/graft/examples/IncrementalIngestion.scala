package graft.examples

import graft.operators.Dedup
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Continuous-ingestion dedup — the end-to-end loop a training-data
  * pipeline runs forever: a stream of arriving documents is checked
  * against the existing corpus (band join, no corpus self-pairing),
  * survivors are appended to the corpus AND to the persisted corpus
  * band table, so the next batch dedups against everything before it.
  *
  * Plan shape per micro-batch (all equi-joins, SCALE.md):
  *   1. `streamingIncrementalCandidates`: per-row banding of the batch
  *      (array folds — no watermark-delayed aggregation) stream-static
  *      joined against the stored band table;
  *   2. inside `foreachBatch`: exact-Jaccard verify of the candidates
  *      (batch API), anti-join the condemned ids, then within-batch
  *      `dropNearDuplicates` (bounded by the batch, not the corpus);
  *   3. append survivors + their `bandedSignatures` rows.
  *
  * Run: `sbt "runMain graft.examples.IncrementalIngestion"`
  */
object IncrementalIngestion {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    import spark.implicits._

    val root = java.nio.file.Files.createTempDirectory("graft_ingest").toString
    val corpusDir = s"$root/corpus"
    val bandsDir = s"$root/bands"

    // day 0: a seeded, already-deduplicated corpus + its band table
    val seed = Seq(
      (100L, "the quick brown fox jumps over the lazy dog near the quiet river bank today"),
      (101L, "completely different content about distributed query engines and storage layers")
    ).toDF("doc_id", "text")
    seed.write.mode("overwrite").parquet(corpusDir)
    Dedup.bandedSignatures(seed, "doc_id", "text")
      .write.mode("overwrite").parquet(bandsDir)

    // the arriving stream: one near-dup of doc 100, one novel doc, and
    // a within-batch duplicate pair (300/301)
    implicit val sqlCtx = spark.sqlContext
    val mem = org.apache.spark.sql.execution.streaming.runtime.MemoryStream[(Long, String)]
    mem.addData(
      (200L, "the quick brown fox jumps over the lazy dog near the quiet river bank now"),
      (201L, "entirely new material about adaptive query execution in modern spark engines"),
      (300L, "repeated batch content that appears twice within one ingestion batch here"),
      (301L, "repeated batch content that appears twice within one ingestion batch here"))
    val arriving = mem.toDF().toDF("doc_id", "text")

    val q = arriving.writeStream
      .outputMode("append")
      .foreachBatch { (batch: org.apache.spark.sql.DataFrame, _: Long) =>
        val corpus = spark.read.parquet(corpusDir)
        // 1+2: against-corpus candidates -> verified drop (batch API
        // reuses the stored band table via candidatesAgainstBanded)
        val cands = Dedup
          .candidatesAgainstBanded(batch, spark.read.parquet(bandsDir), "doc_id", "text")
          .select(col("new_id").as("doc1"), col("corpus_id").as("doc2"))
        val both = batch.select(col("doc_id"), col("text"))
          .union(corpus.select(col("doc_id"), col("text")))
        val losers = Dedup
          .verifyCandidates(cands, both, "doc_id", "text", minJaccard = 0.4)
          .select(col("doc1").as("doc_id")).distinct()
        val survivors0 = batch.join(losers, Seq("doc_id"), "left_anti")
        // 3: within-batch dedup, bounded by the batch size
        val survivors = Dedup.dropNearDuplicates(survivors0, "doc_id", "text")
        // 4: grow the corpus and its band table
        survivors.write.mode("append").parquet(corpusDir)
        Dedup.bandedSignatures(survivors, "doc_id", "text")
          .write.mode("append").parquet(bandsDir)
        ()
      }
      .start()
    q.processAllAvailable()
    q.stop()

    val finalCorpus = spark.read.parquet(corpusDir)
      .select($"doc_id").as[Long].collect().toSet
    println(s"corpus after ingestion: ${finalCorpus.toSeq.sorted.mkString(", ")}")
    // 200 (near-dup of 100) dropped; 201 kept; 300/301 collapsed to 300
    assert(finalCorpus == Set(100L, 101L, 201L, 300L),
      s"unexpected corpus: $finalCorpus")

    spark.stop()
  }
}
