package graft

import graft.streaming.IncrementalSketches
import org.apache.spark.sql.functions._

/** Incrementally-maintained HLL sketch store: per-batch shard sketches
  * appended via foreachBatch, rollup estimates identical to a
  * from-scratch sketch of the accumulated corpus (HLL union is lossless
  * at fixed lgK — SketchesSpec), replay idempotent.
  */
class StreamingSketchesSpec extends SparkSpec {
  import spark.implicits._

  private def docs(ids: Range): Seq[(Long, String, String)] =
    ids.map { i =>
      val words = (0 until 12).map(j => s"w${(i * 31 + j * 7) % 600}").mkString(" ")
      (i.toLong, words, if (i % 2 == 0) "a" else "b")
    }

  test("streamed sketch store matches a from-scratch sketch of the full corpus") {
    val root = java.nio.file.Files.createTempDirectory("graft_sketch_stream").toString
    val store = s"$root/sketches"
    val b0 = docs(0 until 300)
    IncrementalSketches.seed(
      graft.operators.Sketches.explodedTokens(
        b0.toDF("doc_id", "text", "source"), "text", Seq("source")),
      store, Seq("source"), "token")

    implicit val sqlCtx = spark.sqlContext
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    val mem = MemoryStream[(Long, String, String)]
    val q = IncrementalSketches.attach(
      graft.operators.Sketches.explodedTokens(
        mem.toDF().toDF("doc_id", "text", "source"), "text", Seq("source")),
      store, Seq("source"), "token",
      checkpointLocation = Some(s"$root/chk"))
    try {
      mem.addData(docs(300 until 600): _*)
      q.processAllAvailable()
      mem.addData(docs(600 until 900): _*)
      q.processAllAvailable()
    } finally q.stop()

    val streamed = IncrementalSketches
      .estimate(spark, store, Seq("source"))
      .collect()
      .map(r => r.getString(0) -> r.getLong(1))
      .toMap
    // from-scratch single sketch over everything the store has seen
    val all = graft.operators.Sketches.explodedTokens(
      docs(0 until 900).toDF("doc_id", "text", "source"), "text", Seq("source"))
    val direct = all
      .groupBy("source")
      .agg(hll_sketch_estimate(
        hll_sketch_agg(col("token"), graft.operators.Sketches.DefaultLgK))
        .as("distinct_est"))
      .collect()
      .map(r => r.getString(0) -> r.getLong(1))
      .toMap
    assert(streamed == direct, s"streamed=$streamed direct=$direct")

    // and the estimate itself is accurate: within 5% of exact distinct
    val exact = all
      .groupBy("source")
      .agg(countDistinct(col("token")).as("n"))
      .collect()
      .map(r => r.getString(0) -> r.getLong(1))
      .toMap
    for ((src, ex) <- exact)
      assert(math.abs(streamed(src) - ex).toDouble / ex < 0.05,
        s"source=$src est=${streamed(src)} exact=$ex")
  }

  test("streamed KLL quantile store matches a from-scratch pass exactly inside the window") {
    val root = java.nio.file.Files.createTempDirectory("graft_kll_stream").toString
    val store = s"$root/kll"
    def vals(ids: Range) =
      ids.map(i => (i.toLong, if (i % 2 == 0) "a" else "b",
        ((i.toLong * 7919) % 100000).toDouble))
    IncrementalSketches.seedQuantiles(
      vals(0 until 300).toDF("id", "source", "v"),
      store, Seq("source"), "v", k = 4096)

    implicit val sqlCtx = spark.sqlContext
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    val mem = MemoryStream[(Long, String, Double)]
    val q = IncrementalSketches.attachQuantiles(
      mem.toDF().toDF("id", "source", "v"),
      store, Seq("source"), "v", k = 4096,
      checkpointLocation = Some(s"$root/chk"))
    try {
      mem.addData(vals(300 until 700): _*)
      q.processAllAvailable()
      mem.addData(vals(700 until 1000): _*)
      q.processAllAvailable()
    } finally q.stop()

    val rolled = IncrementalSketches
      .quantiles(spark, store, Seq("source"), Seq(0.5, 0.9))
      .collect()
      .map(r => r.getString(0) -> ((r.getDouble(1), r.getDouble(2))))
      .toMap
    // 500 values per source, k=4096 → the store answers EXACT discrete
    // quantiles despite arriving in three installments
    val bySrc = vals(0 until 1000).groupBy(_._2)
      .view.mapValues(_.map(_._3).sorted.toIndexedSeq).toMap
    def disc(s: IndexedSeq[Double], p: Double) =
      s(math.max(1, math.ceil(p * s.length).toInt) - 1)
    for ((src, (p50, p90)) <- rolled) {
      assert(p50 == disc(bySrc(src), 0.5), s"$src p50")
      assert(p90 == disc(bySrc(src), 0.9), s"$src p90")
    }
    // replay idempotence rides the shared stamp discipline
    val rows = spark.read.parquet(store).count()
    IncrementalSketches.ingestQuantilesBatch(spark,
      vals(700 until 1000).toDF("id", "source", "v"),
      store, Seq("source"), "v", batchId = Some(1L), k = 4096)
    assert(spark.read.parquet(store).count() == rows, "replay appended rows")
  }

  test("a replayed batch id is a no-op (exactly-once append)") {
    val root = java.nio.file.Files.createTempDirectory("graft_sketch_replay").toString
    val store = s"$root/sketches"
    val base = docs(0 until 200).toDF("doc_id", "text", "source")
    val toks = graft.operators.Sketches.explodedTokens(base, "text", Seq("source"))
    IncrementalSketches.seed(toks, store, Seq("source"), "token")

    val batch = graft.operators.Sketches.explodedTokens(
      docs(200 until 400).toDF("doc_id", "text", "source"), "text", Seq("source"))
    IncrementalSketches.ingestBatch(spark, batch, store, Seq("source"), "token",
      batchId = Some(7L))
    val afterFirst = IncrementalSketches
      .estimate(spark, store, Seq.empty).head().getLong(0)
    val rowsFirst = spark.read.parquet(store).count()

    // replay: same batch id, content re-offered
    IncrementalSketches.ingestBatch(spark, batch, store, Seq("source"), "token",
      batchId = Some(7L))
    assert(spark.read.parquet(store).count() == rowsFirst, "replay appended rows")
    assert(IncrementalSketches.estimate(spark, store, Seq.empty).head().getLong(0)
      == afterFirst, "replay changed the estimate")
  }
}
