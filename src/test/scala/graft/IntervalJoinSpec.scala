package graft

import graft.operators.IntervalJoin
import org.apache.spark.sql.functions._

import java.sql.Timestamp

/** Bucketized interval-overlap join: hand-pinned boundary semantics
  * plus randomized equivalence against the naive inequality join
  * (the executable spec), and the no-duplicate emit-once guarantee
  * for pairs sharing many grid cells.
  */
class IntervalJoinSpec extends SparkSpec {
  import spark.implicits._

  private def t(s: Long) = new Timestamp(1700000000000L + s * 1000)

  private def mk(rows: (String, Long, Long, Long)*) = {
    val df = rows.toSeq.toDF("k", "id", "s0", "e0")
    df.select($"k", $"id", ($"s0" * 1000 + 1700000000000L).cast("timestamp").as("s"),
      ($"e0" * 1000 + 1700000000000L).cast("timestamp").as("e"))
  }

  test("half-open boundary, multi-bucket spans, emit-once") {
    val l = mk(("A", 1L, 0L, 100L), ("A", 2L, 500L, 2500L), ("B", 5L, 0L, 50L))
      .toDF("k", "l_id", "l_s", "l_e")
    val r = mk(("A", 11L, 100L, 200L), ("A", 12L, 90L, 110L),
      ("A", 13L, 600L, 700L), ("B", 15L, 40L, 60L))
      .toDF("k", "r_id", "r_s", "r_e")
    val got = IntervalJoin
      .overlap(l, r, Seq("k"), "l_s", "l_e", "r_s", "r_e", bucketSeconds = 60)
      .select($"l_id", $"r_id").as[(Long, Long)].collect().toSet
    // 1–11: touch at exactly 100 → NOT an overlap (half-open)
    // 1–12: [0,100) ∩ [90,110) → overlap
    // 2–13: r nested in a 33-bucket l span → exactly once
    // 5–15: cross-key isolation holds (B only)
    assert(got == Set((1L, 12L), (2L, 13L), (5L, 15L)))

    // emit-once under heavy cell sharing: both span many common cells
    val wl = mk(("C", 7L, 0L, 10000L)).toDF("k", "l_id", "l_s", "l_e")
    val wr = mk(("C", 8L, 1L, 9999L)).toDF("k", "r_id", "r_s", "r_e")
    val wide = IntervalJoin
      .overlap(wl, wr, Seq("k"), "l_s", "l_e", "r_s", "r_e", bucketSeconds = 60)
    assert(wide.count() == 1)

    // degenerate (end <= start) intervals drop
    val dl = mk(("D", 9L, 100L, 100L)).toDF("k", "l_id", "l_s", "l_e")
    val dr = mk(("D", 10L, 0L, 1000L)).toDF("k", "r_id", "r_s", "r_e")
    assert(IntervalJoin
      .overlap(dl, dr, Seq("k"), "l_s", "l_e", "r_s", "r_e", 60).count() == 0)
  }

  test("equivalent to the naive inequality join on randomized intervals") {
    val rnd = new scala.util.Random(42)
    def side(pfx: String, n: Int) = (0 until n).map { i =>
      val s = rnd.nextInt(5000).toLong
      (s"k${rnd.nextInt(4)}", (i + (if (pfx == "r") 1000 else 0)).toLong,
        s, s + 1 + rnd.nextInt(400))
    }
    val l = mk(side("l", 120): _*).toDF("k", "l_id", "l_s", "l_e")
    val r = mk(side("r", 120): _*).toDF("k", "r_id", "r_s", "r_e")
    val bucketized = IntervalJoin
      .overlap(l, r, Seq("k"), "l_s", "l_e", "r_s", "r_e", bucketSeconds = 90)
      .select($"l_id", $"r_id").as[(Long, Long)].collect().sorted.toSeq
    val naive = l.join(r, Seq("k"))
      .filter($"l_s" < $"r_e" && $"r_s" < $"l_e")
      .select($"l_id", $"r_id").as[(Long, Long)].collect().sorted.toSeq
    assert(naive.nonEmpty && bucketized == naive)
  }

  test("streaming overlap join matches pairs and excludes the half-open touch") {
    implicit val sqlCtx = spark.sqlContext
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    val lm = MemoryStream[(String, Long, Timestamp, Timestamp)]
    val rm = MemoryStream[(String, Long, Timestamp, Timestamp)]
    val out = IntervalJoin.overlapStream(
      lm.toDF().toDF("k", "l_id", "l_s", "l_e"),
      rm.toDF().toDF("k", "r_id", "r_s", "r_e"),
      Seq("k"), "l_s", "l_e", "r_s", "r_e", maxSpanSeconds = 300)
    val q = out.writeStream.format("memory").queryName("ij_stream")
      .outputMode("append").start()
    try {
      lm.addData(("A", 1L, t(0), t(100)), ("A", 2L, t(500), t(900)))
      rm.addData(
        ("A", 11L, t(90), t(110)), // overlaps 1
        ("A", 12L, t(100), t(200)), // touches 1 at 100 → excluded
        ("A", 13L, t(600), t(650)), // nested in 2
        ("B", 14L, t(0), t(1000))) // wrong key
      q.processAllAvailable()
      val got = spark.table("ij_stream")
        .select($"l_id", $"r_id").as[(Long, Long)].collect().toSet
      assert(got == Set((1L, 11L), (2L, 13L)))
    } finally q.stop()
  }

  test("plans a hash equi-join, not a nested loop") {
    val l = mk(("A", 1L, 0L, 100L)).toDF("k", "l_id", "l_s", "l_e")
    val r = mk(("A", 2L, 50L, 150L)).toDF("k", "r_id", "r_s", "r_e")
    val plan = IntervalJoin
      .overlap(l, r, Seq("k"), "l_s", "l_e", "r_s", "r_e", 60)
      .queryExecution.executedPlan.toString
    assert(!plan.contains("NestedLoop") && !plan.contains("Cartesian"), plan)
  }
}
