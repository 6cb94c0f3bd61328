package graft

import graft.operators.History
import graft.streaming.IncrementalScd2
import org.apache.spark.sql.functions._

import java.sql.Timestamp

/** Streaming SCD2 maintenance: the append-only change-log store driven
  * by a MemoryStream across micro-batches must converge to exactly the
  * batch [[History.scd2]] of the full event history — including the
  * cross-batch collapse (an unchanged attribute spanning a batch
  * boundary must NOT open a new version) — and replays must be no-ops.
  */
class IncrementalScd2Spec extends SparkSpec {
  import spark.implicits._

  private def t(s: Int) = Timestamp.valueOf(f"2024-01-01 00:00:$s%02d")

  private val K = Seq("k")
  private val A = Seq("attr")
  private val T = Seq("id")

  test("stream-maintained store converges to the batch scd2, across-batch no-ops collapse") {
    val dir = java.nio.file.Files.createTempDirectory("graft_scd2").toString + "/store"
    // seed history: A is x (two no-op updates collapse), B is z
    val seed = Seq(
      ("A", t(1), 1L, "x"), ("A", t(2), 2L, "x"), ("B", t(2), 3L, "z")
    ).toDF("k", "ts", "id", "attr")
    IncrementalScd2.seed(seed, dir, K, "ts", A, T)

    implicit val sqlCtx = spark.sqlContext
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    val mem = MemoryStream[(String, Timestamp, Long, String)]
    val q = IncrementalScd2.attach(
      mem.toDF().toDF("k", "ts", "id", "attr"), dir, K, "ts", A, T)
    try {
      // batch 1: A stays x at t3 (cross-batch no-op — must NOT version),
      // then flips to y at t4; C is a brand-new key
      mem.addData(("A", t(3), 4L, "x"), ("A", t(4), 5L, "y"), ("C", t(3), 6L, "w"))
      q.processAllAvailable()
      // batch 2: B re-asserts z (no-op), A flips back to x; a
      // within-batch no-op pair for C
      mem.addData(("B", t(5), 7L, "z"), ("A", t(6), 8L, "x"),
        ("C", t(5), 9L, "w"), ("C", t(6), 10L, "v"))
      q.processAllAvailable()
    } finally q.stop()

    val allEvents = Seq(
      ("A", t(1), 1L, "x"), ("A", t(2), 2L, "x"), ("B", t(2), 3L, "z"),
      ("A", t(3), 4L, "x"), ("A", t(4), 5L, "y"), ("C", t(3), 6L, "w"),
      ("B", t(5), 7L, "z"), ("A", t(6), 8L, "x"),
      ("C", t(5), 9L, "w"), ("C", t(6), 10L, "v")
    ).toDF("k", "ts", "id", "attr")
    val expected = History.scd2(allEvents, K, "ts", A, T)
    val got = IncrementalScd2.view(spark, dir, K, "ts", A, T)
    assert(got.exceptAll(expected).isEmpty && expected.exceptAll(got).isEmpty,
      s"view:\n${got.orderBy($"k", $"version").collect().mkString("\n")}\n" +
        s"expected:\n${expected.orderBy($"k", $"version").collect().mkString("\n")}")

    // the store holds one row per VERSION, not per event: 3 (A) + 1 (B)
    // + 2 (C) = 6 change rows for 10 events
    assert(spark.read.parquet(dir).count() == 6)

    // current snapshot is queryable: is_current rows only
    val current = got.filter($"is_current").select($"k", $"attr").as[(String, String)]
      .collect().toMap
    assert(current == Map("A" -> "x", "B" -> "z", "C" -> "v"))

    // the compacted HEAD store holds exactly one row per key — the
    // open version — so the next batch's open-fetch is O(#keys) no
    // matter how long the version log grows
    val head = spark.read.parquet(dir + "_open")
    assert(head.count() == 3, s"head not folded: ${head.collect().mkString(",")}")
    val headMap = head.select($"k", $"attr").as[(String, String)].collect().toMap
    assert(headMap == Map("A" -> "x", "B" -> "z", "C" -> "v"))
  }

  test("periodic compaction bounds the store's file count without losing state") {
    val dir = java.nio.file.Files.createTempDirectory("graft_scd2c").toString + "/store"
    IncrementalScd2.seed(
      Seq(("A", t(0), 0L, "s")).toDF("k", "ts", "id", "attr"), dir, K, "ts", A, T)
    implicit val sqlCtx = spark.sqlContext
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    val mem = MemoryStream[(String, Timestamp, Long, String)]
    val q = IncrementalScd2.attach(
      mem.toDF().toDF("k", "ts", "id", "attr"), dir, K, "ts", A, T,
      compactEvery = Some(2), compactTargetBytes = 1L << 20)
    try {
      (1 to 6).foreach { i =>
        mem.addData(("A", t(i), i.toLong, s"v$i"))
        q.processAllAvailable()
      }
    } finally q.stop()
    val files = Option(new java.io.File(dir).listFiles()).get
      .count(f => f.isFile && f.getName.endsWith(".parquet"))
    // 7 appends (seed + 6) would leave ≥ 7 files; compaction folds them
    assert(files <= 3, s"expected a compacted store, found $files files")
    // state intact: 7 versions of A (s, v1..v6), v6 current
    val v = IncrementalScd2.view(spark, dir, K, "ts", A, T)
    assert(v.count() == 7)
    assert(v.filter($"is_current").select($"attr").as[String].collect().toSeq == Seq("v6"))
  }

  test("replayed batch is a no-op (batchId-keyed append)") {
    val dir = java.nio.file.Files.createTempDirectory("graft_scd2r").toString + "/store"
    IncrementalScd2.seed(
      Seq(("A", t(1), 1L, "x")).toDF("k", "ts", "id", "attr"), dir, K, "ts", A, T)
    val batch = Seq(("A", t(2), 2L, "y")).toDF("k", "ts", "id", "attr")
    IncrementalScd2.ingestBatch(spark, batch, dir, K, "ts", A, T, batchId = Some(7L))
    val once = IncrementalScd2.view(spark, dir, K, "ts", A, T).collect().toSet
    IncrementalScd2.ingestBatch(spark, batch, dir, K, "ts", A, T, batchId = Some(7L))
    val twice = IncrementalScd2.view(spark, dir, K, "ts", A, T).collect().toSet
    assert(once == twice && spark.read.parquet(dir).count() == 2)
  }
}
