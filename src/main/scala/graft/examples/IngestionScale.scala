package graft.examples

import graft.operators.Dedup
import graft.sources.Tables
import graft.streaming.IncrementalDedup
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Scale evidence for the continuous-ingestion dedup loop: feed the
  * sf-dir documents table through [[IncrementalDedup.ingestBatch]] in
  * equal-size batches and print per-batch wall seconds while the
  * corpus (and its persisted band table) grows. The claim under test:
  * batch cost tracks |batch| + touched buckets, NOT corpus size — the
  * per-batch line should stay flat, not climb with the batch index.
  *
  * Run: `SPARK_GRAFT_SF_DIR=/root/testdata/sf0.1 sbt "runMain graft.examples.IngestionScale"`
  * (numbers recorded in BASELINE.md).
  */
object IngestionScale {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val batches = sys.env.getOrElse("SPARK_GRAFT_BATCHES", "5").toInt
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    val root = java.nio.file.Files.createTempDirectory("graft_ingest_scale").toString
    val corpusDir = s"$root/corpus"
    val bandsDir = s"$root/bands"

    val docs = Tables.load(spark, sfDir, "documents").select(col("doc_id"), col("text"))
    val n = docs.count()
    val per = n / (batches + 1)

    // seed: the first slice is the existing corpus
    val seed = docs.filter(col("doc_id") < per)
    seed.write.mode("overwrite").parquet(corpusDir)
    Dedup.bandedSignatures(seed, "doc_id", "text")
      .write.mode("overwrite").parquet(bandsDir)
    println(s"[scale] seeded corpus: ${seed.count()} docs from $sfDir")

    (1 to batches).foreach { b =>
      val lo = per * b
      val hi = per * (b + 1)
      val batch = docs.filter(col("doc_id") >= lo && col("doc_id") < hi)
      val t0 = System.nanoTime()
      IncrementalDedup.ingestBatch(spark, batch, corpusDir, bandsDir)
      val sec = (System.nanoTime() - t0) / 1e9
      val corpusNow = spark.read.parquet(corpusDir).count()
      println(f"[scale] batch $b: ${hi - lo} docs in $sec%.2f s; corpus now $corpusNow")
    }
    spark.stop()
  }
}
