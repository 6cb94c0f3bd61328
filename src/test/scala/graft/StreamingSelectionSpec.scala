package graft

import graft.operators.Selection
import graft.streaming.IncrementalSelection
import org.apache.spark.sql.functions._

/** Incrementally-maintained DSIR count store: per-batch 2·buckets count
  * vectors appended via foreachBatch, the merged ratio table IDENTICAL
  * (double-for-double) to a from-scratch fit of the accumulated corpus
  * — bucket counts are longs, addition is exact, and both smoothing
  * totals derive from the summed vector — so scoring fresh documents
  * through the store equals [[Selection.dsirScore]] on the full corpus.
  * Replay idempotent via the ingest_batch stamp.
  */
class StreamingSelectionSpec extends SparkSpec {
  import spark.implicits._

  private val B = 256

  private def docs(ids: Range): Seq[(Long, String)] =
    ids.map { i =>
      val target = i % 3 == 0
      val words =
        if (target) Seq.tabulate(12)(j => Seq("clean", "prose", "cited", "edited")((i + j) % 4))
        else Seq.tabulate(12)(j => Seq("spam", "lorem", "click", "now", "buy")((i + j) % 5))
      (i.toLong, words.mkString(" "))
    }

  private def isTarget = col("doc_id") % 3 === 0

  test("streamed count store yields ratios identical to a from-scratch fit of the full corpus") {
    val root = java.nio.file.Files.createTempDirectory("graft_dsir_stream").toString
    val store = s"$root/dsir"
    IncrementalSelection.seed(
      docs(0 until 120).toDF("doc_id", "text"), store, "text", isTarget, buckets = B)

    implicit val sqlCtx = spark.sqlContext
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    val mem = MemoryStream[(Long, String)]
    val q = IncrementalSelection.attach(
      mem.toDF().toDF("doc_id", "text"), store, "text", isTarget, buckets = B,
      checkpointLocation = Some(s"$root/chk"))
    try {
      mem.addData(docs(120 until 240): _*)
      q.processAllAvailable()
      mem.addData(docs(240 until 360): _*)
      q.processAllAvailable()
    } finally q.stop()

    val streamed = IncrementalSelection.ratios(spark, store, buckets = B)
      .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    val direct = Selection
      .dsirLogRatios(docs(0 until 360).toDF("doc_id", "text"), "text", isTarget, buckets = B)
      .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    assert(streamed.size == B && direct.size == B)
    assert(streamed == direct, {
      val diff = streamed.collect { case (b, v) if direct(b) != v => (b, v, direct(b)) }.take(3)
      s"ratio tables diverge, e.g. $diff"
    })

    // scoring unseen docs through the store == dsirScore's weights had
    // those ratios been fit from scratch (dsirWeights path is shared;
    // the identity above makes the literal tables byte-equal)
    val fresh = docs(360 until 400).toDF("doc_id", "text")
    val viaStore = IncrementalSelection
      .score(fresh, "doc_id", "text", store, buckets = B)
      .collect().map(r => r.getLong(0) -> r.getDouble(2)).toMap
    val viaBatch = Selection
      .dsirWeights(fresh, "doc_id", "text",
        Selection.dsirLogRatios(docs(0 until 360).toDF("doc_id", "text"), "text", isTarget, buckets = B),
        buckets = B)
      .collect().map(r => r.getLong(0) -> r.getDouble(2)).toMap
    assert(viaStore == viaBatch)
  }

  test("replayed batch id no-ops; repaired append carries identical content") {
    val root = java.nio.file.Files.createTempDirectory("graft_dsir_replay").toString
    val store = s"$root/dsir"
    val slice = docs(0 until 60).toDF("doc_id", "text")
    // attach-without-seed: first stamped batch bootstraps the store
    IncrementalSelection.ingestBatch(
      spark, slice, store, "text", isTarget, buckets = B, batchId = Some(0L))
    val after1 = spark.read.parquet(store).count()
    val ratios1 = IncrementalSelection.ratios(spark, store, buckets = B)
      .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    // replay of the same batch id must not double-count
    IncrementalSelection.ingestBatch(
      spark, slice, store, "text", isTarget, buckets = B, batchId = Some(0L))
    assert(spark.read.parquet(store).count() == after1)
    val ratios2 = IncrementalSelection.ratios(spark, store, buckets = B)
      .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    assert(ratios1 == ratios2)
  }

  test("compactEvery folds the count store; the _graft_meta sidecar survives the swap") {
    val root = java.nio.file.Files.createTempDirectory("graft_dsir_compact").toString
    val store = s"$root/dsir"
    IncrementalSelection.seed(
      docs(0 until 120).toDF("doc_id", "text"), store, "text", isTarget, buckets = B)
    implicit val sqlCtx = spark.sqlContext
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    val mem = MemoryStream[(Long, String)]
    val q = IncrementalSelection.attach(
      mem.toDF().toDF("doc_id", "text"), store, "text", isTarget, buckets = B,
      checkpointLocation = Some(s"$root/chk"), compactEvery = Some(2))
    try {
      (0 until 6).foreach { i =>
        mem.addData(docs(120 + i * 40 until 160 + i * 40): _*)
        q.processAllAvailable()
      }
    } finally q.stop()
    // 7 appends folded (last compaction at bid 4; bid 5 appends after)
    val files = Option(new java.io.File(store).listFiles()).get
      .count(f => f.isFile && f.getName.endsWith(".parquet"))
    assert(files <= 4, s"expected a compacted count store, found $files files")
    // the meta sidecar rode through every swap: parameter validation
    // still passes AND still rejects a mismatch
    val streamed = IncrementalSelection.ratios(spark, store, buckets = B)
      .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    intercept[IllegalArgumentException] {
      IncrementalSelection.ratios(spark, store, buckets = B * 2)
    }
    // and the folded store still matches a from-scratch fit exactly
    val direct = Selection
      .dsirLogRatios(docs(0 until 360).toDF("doc_id", "text"), "text", isTarget, buckets = B)
      .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    assert(streamed == direct)
  }

  test("a buckets/n/family mismatch against the persisted store metadata fails loudly") {
    import graft.operators.HashFamily
    val root = java.nio.file.Files.createTempDirectory("graft_dsir_meta").toString
    val store = s"$root/dsir"
    IncrementalSelection.seed(
      docs(0 until 30).toDF("doc_id", "text"), store, "text", isTarget, buckets = B)

    // wrong buckets at merge: the slice windows would land on the wrong
    // cells — must fail loudly instead of returning wrong ratios
    val e1 = intercept[IllegalArgumentException] {
      IncrementalSelection.ratios(spark, store, buckets = B * 2)
    }
    assert(e1.getMessage.contains("buckets"))
    // wrong hash family at score: bucket assignments differ per family
    val e2 = intercept[IllegalArgumentException] {
      IncrementalSelection.score(
        docs(0 until 5).toDF("doc_id", "text"), "doc_id", "text", store,
        buckets = B, family = HashFamily.XxHash64)
    }
    assert(e2.getMessage.contains("family"))
    // wrong n-gram order at ingest: would mix 2-gram and 3-gram counts
    val e3 = intercept[IllegalArgumentException] {
      IncrementalSelection.ingestBatch(
        spark, docs(30 until 40).toDF("doc_id", "text"), store, "text", isTarget,
        buckets = B, n = 3, batchId = Some(1L))
    }
    assert(e3.getMessage.contains("n="))
    // matching parameters still work, and the data read skips _graft_meta
    assert(IncrementalSelection.ratios(spark, store, buckets = B).count() == B)
  }
}
