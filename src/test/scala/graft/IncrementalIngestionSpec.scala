package graft

import graft.operators.Dedup
import graft.streaming.IncrementalDedup
import org.apache.spark.sql.functions._

/** END-TO-END streaming incremental dedup: the full band → stream-static
  * join → verify → drop → append loop ([[IncrementalDedup]]) driven by a
  * MemoryStream across MULTIPLE micro-batches — proving not just the
  * candidate stage (DedupSpec pins that) but that batch N's survivors
  * are part of the corpus batch N+1 dedups against.
  */
class IncrementalIngestionSpec extends SparkSpec {
  import spark.implicits._

  test("ingestion loop drops near-dups across micro-batches, corpus and band table grow") {
    val root = java.nio.file.Files.createTempDirectory("graft_ingest_spec").toString
    val corpusDir = s"$root/corpus"
    val bandsDir = s"$root/bands"

    // day 0: a seeded, already-deduplicated corpus + its UNCAPPED band table
    val seed = Seq(
      (100L, "the quick brown fox jumps over the lazy dog near the quiet river bank today"),
      (101L, "completely different content about distributed query engines and storage layers")
    ).toDF("doc_id", "text")
    seed.write.mode("overwrite").parquet(corpusDir)
    Dedup.bandedSignatures(seed, "doc_id", "text")
      .write.mode("overwrite").parquet(bandsDir)

    implicit val sqlCtx = spark.sqlContext
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    val mem = MemoryStream[(Long, String)]
    val q = IncrementalDedup.attach(
      mem.toDF().toDF("doc_id", "text"), corpusDir, bandsDir)
    try {
      // batch 1: a near-dup of seeded doc 100, a novel doc, and a
      // within-batch duplicate pair (300/301 collapse to 300)
      mem.addData(
        (200L, "the quick brown fox jumps over the lazy dog near the quiet river bank now"),
        (201L, "entirely new material about adaptive query execution in modern spark engines"),
        (300L, "repeated batch content that appears twice within one ingestion batch here"),
        (301L, "repeated batch content that appears twice within one ingestion batch here"))
      q.processAllAvailable()
      val afterB1 = spark.read.parquet(corpusDir).select($"doc_id").as[Long].collect().toSet
      assert(afterB1 == Set(100L, 101L, 201L, 300L),
        s"batch 1: 200 near-dups seed 100, 301 collapses into 300 — got $afterB1")

      // batch 2: a near-dup of doc 201 — which arrived IN BATCH 1, so
      // dropping it proves the corpus and band table actually grew —
      // plus a near-dup of the within-batch survivor 300, plus one
      // genuinely novel doc. The near-dups append one word (Jaccard
      // ≈ 0.9): a mid-text edit can deterministically miss the 4-band
      // LSH (md5 is fixed, there is no retry luck), a suffix append
      // leaves most minhash values — and so at least one band — intact.
      mem.addData(
        (400L, "entirely new material about adaptive query execution in modern spark engines overall"),
        (401L, "repeated batch content that appears twice within one ingestion batch here indeed"),
        (402L, "unrelated fresh text about columnar shuffle formats and spill behavior limits"))
      q.processAllAvailable()
      val afterB2 = spark.read.parquet(corpusDir).select($"doc_id").as[Long].collect().toSet
      assert(afterB2 == Set(100L, 101L, 201L, 300L, 402L),
        s"batch 2: 400 near-dups batch-1 survivor 201, 401 near-dups 300 — got $afterB2")

      // the band table covers every survivor (4 bands each), so batch 3
      // would dedup against all of them without re-shingling the corpus
      val bandedIds = spark.read.parquet(bandsDir)
        .select($"doc_id").distinct().as[Long].collect().toSet
      assert(bandedIds == afterB2, s"band table must track the corpus — got $bandedIds")
      // ...and it is audit-ready: built uncapped, nothing excluded
      assert(Dedup.droppedBucketsFromBanded(
        spark.read.parquet(bandsDir), Int.MaxValue).isEmpty)
    } finally q.stop()
  }
}
