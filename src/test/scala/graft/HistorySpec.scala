package graft

import graft.operators.History
import org.apache.spark.sql.functions._

import java.sql.Timestamp

/** SCD type-2 materialization semantics on hand-computed histories. */
class HistorySpec extends SparkSpec {
  import spark.implicits._

  private def t(s: Int) = Timestamp.valueOf(s"2024-01-01 00:00:0$s")

  private def history = Seq(
    // key A: x x y y x → collapsed versions x, y, x
    ("A", t(1), 1L, "x"),
    ("A", t(2), 2L, "x"),
    ("A", t(3), 3L, "y"),
    ("A", t(4), 4L, "y"),
    ("A", t(5), 5L, "x"),
    // key B: single row → one open version
    ("B", t(2), 6L, "z")
  ).toDF("k", "ts", "id", "attr")

  test("collapse folds no-op updates into open intervals") {
    val got = History
      .scd2(history, Seq("k"), "ts", Seq("attr"), Seq("id"))
      .orderBy($"k", $"version")
      .collect()
      .map(r => (r.getString(0), r.getString(1), r.getTimestamp(2),
        Option(r.getTimestamp(3)), r.getLong(4), r.getBoolean(5)))
    assert(got.toSeq == Seq(
      ("A", "x", t(1), Some(t(3)), 1L, false),
      ("A", "y", t(3), Some(t(5)), 2L, false),
      ("A", "x", t(5), None, 3L, true),
      ("B", "z", t(2), None, 1L, true)
    ))
  }

  test("collapseUnchanged=false keeps every update as a version") {
    val got = History
      .scd2(history, Seq("k"), "ts", Seq("attr"), Seq("id"), collapseUnchanged = false)
      .filter($"k" === "A")
    assert(got.count() == 5)
    // intervals still chain: each valid_to equals the next valid_from
    val rows = got.orderBy($"version").collect()
    rows.sliding(2).foreach { case Array(a, b) =>
      assert(a.getTimestamp(3) == b.getTimestamp(2))
    }
    assert(rows.last.isNullAt(3) && rows.last.getBoolean(5))
  }

  test("duplicate timestamps resolve by the tie-break column") {
    val dup = Seq(
      ("C", t(1), 10L, "p"),
      ("C", t(1), 11L, "q"), // same ts — id decides the order
      ("C", t(2), 12L, "q")
    ).toDF("k", "ts", "id", "attr")
    val got = History
      .scd2(dup, Seq("k"), "ts", Seq("attr"), Seq("id"))
      .orderBy($"version")
      .select($"attr", $"version", $"is_current")
      .collect()
      .map(r => (r.getString(0), r.getLong(1), r.getBoolean(2)))
    // p (id 10) then q (id 11); the t(2) q collapses into it
    assert(got.toSeq == Seq(("p", 1L, false), ("q", 2L, true)))
  }

  test("null attributes: first row kept, null-to-null collapses") {
    val n = Seq(
      ("D", t(1), 20L, null.asInstanceOf[String]),
      ("D", t(2), 21L, null.asInstanceOf[String]),
      ("D", t(3), 22L, "w")
    ).toDF("k", "ts", "id", "attr")
    val got = History
      .scd2(n, Seq("k"), "ts", Seq("attr"), Seq("id"))
      .orderBy($"version")
      .collect()
      .map(r => (Option(r.getString(1)), r.getLong(4)))
    assert(got.toSeq == Seq((None, 1L), (Some("w"), 2L)))
  }

  test("the plan shuffles once: one Exchange, key-partitioned windows only") {
    val plan = History
      .scd2(history, Seq("k"), "ts", Seq("attr"), Seq("id"))
      .queryExecution.executedPlan.toString
    assert("Exchange hashpartitioning".r.findAllIn(plan).size == 1, plan)
    assert(!plan.contains("SinglePartition"), plan)
  }
}
