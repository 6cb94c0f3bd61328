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
