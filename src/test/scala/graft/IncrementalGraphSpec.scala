package graft

import graft.operators.Graph
import graft.streaming.IncrementalGraph
import org.apache.spark.sql.functions._

/** Incremental link-graph store: snapshots over the streamed store are
  * IDENTICAL to from-scratch graph passes over the accumulated edge
  * set; batch replays and edge re-observations are no-ops.
  */
class IncrementalGraphSpec extends SparkSpec {
  import spark.implicits._

  // deterministic synthetic crawl slice: funnel + hub edges over [lo, hi)
  private def crawl(lo: Int, hi: Int): Seq[(Long, Long)] =
    (lo until hi).flatMap { i =>
      Seq((i.toLong, ((i / 3 + 17) % 120).toLong), (i.toLong, (i % 7).toLong))
    }.filter { case (s, d) => s != d }

  test("streamed store snapshots equal from-scratch graph passes (bit-identical)") {
    val root = java.nio.file.Files.createTempDirectory("graft_graph_inc").toString
    val store = s"$root/edges"
    IncrementalGraph.seed(crawl(0, 40).toDF("src", "dst"), store)

    implicit val sqlCtx = spark.sqlContext
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    val mem = MemoryStream[(Long, Long)]
    val q = IncrementalGraph.attach(
      mem.toDF().toDF("src", "dst"), store,
      checkpointLocation = Some(s"$root/chk"))
    try {
      mem.addData(crawl(40, 80): _*)
      q.processAllAvailable()
      // second slice re-observes some of the first (overlap 60-80):
      // edge-set semantics collapse the duplicates
      mem.addData(crawl(60, 120): _*)
      q.processAllAvailable()
    } finally q.stop()

    val all = crawl(0, 120).distinct.toDF("src", "dst")
    val nodes = all.select(col("src").as("id"))
      .unionAll(all.select(col("dst").as("id"))).distinct()

    val streamedRanks = IncrementalGraph.rankSnapshot(spark, store, iterations = 4)
      .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    val scratchRanks = Graph.pageRank(nodes, all, iterations = 4)
      .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    // decimal contribution sums make the comparison exact, not approximate
    assert(streamedRanks == scratchRanks)

    val streamedDeg = IncrementalGraph.degreeSnapshot(spark, store)
      .collect().map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2)))).toMap
    val scratchDeg = Graph.degrees(nodes, all)
      .collect().map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2)))).toMap
    assert(streamedDeg == scratchDeg)
  }

  test("tolerance-stopped refresh reaches the same fixpoint from cold and warm starts") {
    val root = java.nio.file.Files.createTempDirectory("graft_graph_warm").toString
    val store = s"$root/edges"
    IncrementalGraph.ingestBatch(spark, crawl(0, 100).toDF("src", "dst"), store, batchId = Some(0L))
    val (snap0, rounds0) = IncrementalGraph.rankSnapshotConverged(spark, store, tol = 1e-6)
    assert(rounds0 > 1)
    // an edge batch arrives; refresh cold and warm-started from snap0.
    // NOTE the round counts: on THIS graph cold (27) beats warm (60) —
    // the warm error vector is pure slow-eigenmode while the uniform
    // start's error avoids it (see Graph.pageRankConverged scaladoc).
    // The spec pins the contraction guarantee (same fixpoint), not a
    // rounds saving, which is spectrum-dependent.
    IncrementalGraph.ingestBatch(spark, crawl(100, 110).toDF("src", "dst"), store, batchId = Some(1L))
    val (cold, coldRounds) = IncrementalGraph.rankSnapshotConverged(spark, store, tol = 1e-6)
    val (warm, warmRounds) = IncrementalGraph.rankSnapshotConverged(
      spark, store, tol = 1e-6, warmStart = Some(snap0))
    assert(coldRounds > 1 && warmRounds > 1)
    // both stopped within tol of the SAME fixpoint: each run's distance
    // to it is bounded by resid·d/(1−d) ≈ 5.7·tol, so allow 1e-4
    val c = cold.collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    val w = warm.collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    assert(c.keySet == w.keySet)
    for ((k, v) <- c) assert(math.abs(v - w(k)) < 1e-4, s"node $k: cold=$v warm=${w(k)}")
  }

  test("an unconverged fixpoint errors instead of returning partial ranks") {
    val root = java.nio.file.Files.createTempDirectory("graft_graph_ncv").toString
    val store = s"$root/edges"
    IncrementalGraph.ingestBatch(spark, crawl(0, 60).toDF("src", "dst"), store, batchId = Some(0L))
    val ex = intercept[IllegalStateException] {
      IncrementalGraph.rankSnapshotConverged(spark, store, tol = 1e-12, maxRounds = 3)
    }
    assert(ex.getMessage.contains("raise maxRounds"))
  }

  test("a replayed batch id is a no-op (exactly-once append)") {
    val root = java.nio.file.Files.createTempDirectory("graft_graph_replay").toString
    val store = s"$root/edges"
    val batch = crawl(0, 30).toDF("src", "dst")
    IncrementalGraph.ingestBatch(spark, batch, store, batchId = Some(0L))
    val after1 = spark.read.parquet(store).count()
    IncrementalGraph.ingestBatch(spark, batch, store, batchId = Some(0L)) // replay
    assert(spark.read.parquet(store).count() == after1)
    IncrementalGraph.ingestBatch(spark, batch, store, batchId = Some(1L)) // new batch
    assert(spark.read.parquet(store).count() == 2 * after1)
    // edge-SET semantics: the duplicate rows collapse at load time
    assert(IncrementalGraph.loadEdges(spark, store).count() == after1)
  }

  test("attach without a prior seed bootstraps the store on the first batch") {
    val root = java.nio.file.Files.createTempDirectory("graft_graph_boot").toString
    val store = s"$root/edges" // never seeded
    implicit val sqlCtx = spark.sqlContext
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    val mem = MemoryStream[(Long, Long)]
    val q = IncrementalGraph.attach(mem.toDF().toDF("src", "dst"), store)
    try {
      mem.addData(crawl(0, 25): _*)
      q.processAllAvailable()
      assert(q.exception.isEmpty, q.exception.map(_.toString).getOrElse(""))
    } finally q.stop()
    assert(IncrementalGraph.degreeSnapshot(spark, store).count() > 0)
  }
}
