package graft

import graft.sources.Lake
import graft.streaming.IncrementalManifest
import org.apache.spark.sql.functions._

/** Incrementally-maintained shard manifest: per-batch manifest rows
  * appended via foreachBatch; the rollup (counts add, token masses
  * add, bit_xor checksums merge) is IDENTICAL cell-for-cell to a
  * from-scratch Lake.shardManifest of the accumulated corpus. Replay
  * idempotent; a double-ingested row corrupts the checksum VISIBLY
  * (xor cancels it out) — the integrity contract, not a silent case.
  */
class StreamingManifestSpec extends SparkSpec {
  import spark.implicits._

  private val Shards = 16

  private def docs(ids: Range): Seq[(Long, String, Long)] =
    ids.map(i => (i.toLong, s"doc $i " + ("w " * (i % 9)).trim, (i % 9 + 2).toLong))

  test("streamed manifest rollup equals a from-scratch manifest of the full corpus") {
    val root = java.nio.file.Files.createTempDirectory("graft_manifest_stream").toString
    val store = s"$root/manifest"
    IncrementalManifest.seed(
      docs(0 until 150).toDF("id", "text", "n_tok"),
      store, "id", Seq("id", "text"), Shards, seed = "m1", tokenCol = Some("n_tok"))

    implicit val sqlCtx = spark.sqlContext
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    val mem = MemoryStream[(Long, String, Long)]
    val q = IncrementalManifest.attach(
      mem.toDF().toDF("id", "text", "n_tok"),
      store, "id", Seq("id", "text"), Shards, seed = "m1", tokenCol = Some("n_tok"),
      checkpointLocation = Some(s"$root/chk"))
    try {
      mem.addData(docs(150 until 300): _*)
      q.processAllAvailable()
      mem.addData(docs(300 until 450): _*)
      q.processAllAvailable()
    } finally q.stop()

    val streamed = IncrementalManifest.manifest(spark, store)
      .collect().map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2), r.getLong(3)))).toMap
    val direct = Lake
      .shardManifest(docs(0 until 450).toDF("id", "text", "n_tok"),
        "id", Seq("id", "text"), Shards, seed = "m1", tokenCol = Some("n_tok"))
      .collect().map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2), r.getLong(3)))).toMap
    assert(streamed == direct, "streamed manifest diverges from the from-scratch manifest")
  }

  test("replayed batch id no-ops; a genuine double-ingest corrupts the checksum visibly") {
    val root = java.nio.file.Files.createTempDirectory("graft_manifest_replay").toString
    val store = s"$root/manifest"
    val slice = docs(0 until 80).toDF("id", "text", "n_tok")
    IncrementalManifest.ingestBatch(
      spark, slice, store, "id", Seq("id", "text"), Shards, seed = "m2",
      tokenCol = Some("n_tok"), batchId = Some(0L))
    val m1 = IncrementalManifest.manifest(spark, store)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(3))).toSet
    // replay: same batch id → no-op
    IncrementalManifest.ingestBatch(
      spark, slice, store, "id", Seq("id", "text"), Shards, seed = "m2",
      tokenCol = Some("n_tok"), batchId = Some(0L))
    val m2 = IncrementalManifest.manifest(spark, store)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(3))).toSet
    assert(m2 == m1)
    // a DIFFERENT batch id carrying the same rows is a real (erroneous)
    // double-ingest: counts double and every duplicated hash xors OUT
    // of its shard checksum — the divergence a loader-side verify sees
    IncrementalManifest.ingestBatch(
      spark, slice, store, "id", Seq("id", "text"), Shards, seed = "m2",
      tokenCol = Some("n_tok"), batchId = Some(1L))
    val m3 = IncrementalManifest.manifest(spark, store)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(3)))
    assert(m3.forall(_._3 == 0L), "duplicated rows must cancel their checksums to 0")
    assert(m3.map(_._2).sum == 160)
  }
}
