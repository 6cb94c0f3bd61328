package graft

import graft.operators.Retrieval
import org.apache.spark.sql.functions._

/** Reciprocal-rank fusion against hand-computed scores. */
class RetrievalSpec extends SparkSpec {

  private def list(rows: (Long, Long, Int)*) = {
    import spark.implicits._
    rows.toDF("query_id", "doc_id", "rank")
  }

  test("fuses two lists with 1/(k+rank) and counts list membership") {
    val sparse = list((1L, 100L, 1), (1L, 200L, 2), (1L, 300L, 3))
    val dense = list((1L, 200L, 1), (1L, 400L, 2))
    val out = Retrieval
      .rrfFuse(Seq(sparse, dense), k = 60, topK = 10)
      .orderBy(col("rank"))
      .collect()
    // doc 200: 1/62 + 1/61 = 0.032522 — in both lists, wins
    // doc 100: 1/61 = 0.016393; doc 400: 1/62 = 0.016129; doc 300: 1/63
    assert(out.map(r => (r.getLong(1), r.getDouble(2), r.getInt(3))).toSeq === Seq(
      (200L, 0.032522, 2),
      (100L, 0.016393, 1),
      (400L, 0.016129, 1),
      (300L, 0.015873, 1)))
    assert(out.map(_.getInt(4)).toSeq === Seq(1, 2, 3, 4))
  }

  test("equal-score docs tie-break by doc_id, topK bounds the output") {
    // two docs each only in one list at the same rank → identical rrf
    val a = list((1L, 900L, 1))
    val b = list((1L, 50L, 1))
    val out = Retrieval
      .rrfFuse(Seq(a, b), k = 60, topK = 1)
      .collect()
    assert(out.length === 1)
    assert(out.head.getLong(1) === 50L) // smaller id wins the tie
  }

  test("queries fuse independently") {
    val sparse = list((1L, 10L, 1), (2L, 20L, 1))
    val dense = list((2L, 20L, 3))
    val out = Retrieval
      .rrfFuse(Seq(sparse, dense), k = 60, topK = 10)
      .orderBy(col("query_id"))
      .collect()
    assert(out.length === 2)
    assert(out(0).getInt(3) === 1) // q1 doc only in sparse
    assert(out(1).getInt(3) === 2) // q2 doc in both
  }
}
