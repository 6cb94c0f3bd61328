package graft

import graft.operators.Graph
import org.apache.spark.sql.functions._

/** Link-graph centrality (operators/Graph.scala): closed-form PageRank
  * pins, dangling-mass redistribution (the path the gated queries'
  * dangling-free graph never exercises), degree semantics, and the
  * reliable-checkpoint durability arm.
  */
class GraphSpec extends SparkSpec {

  import spark.implicits._

  private def nodes(ids: Long*) = ids.toDF("id")
  private def edges(es: (Long, Long)*) = es.toDF("src", "dst")

  test("a directed cycle keeps the uniform distribution at every iteration") {
    // pr=1/3 is the fixed point: each node receives exactly one full
    // rank, so (1-d)/3 + d*(1/3) = 1/3
    val pr = Graph
      .pageRank(nodes(1L, 2L, 3L), edges(1L -> 2L, 2L -> 3L, 3L -> 1L), iterations = 4)
      .collect()
      .map(r => r.getLong(0) -> r.getDouble(1))
      .toMap
    assert(pr.keySet == Set(1L, 2L, 3L))
    pr.values.foreach(v => assert(math.abs(v - 1.0 / 3) < 1e-12))
  }

  test("dangling mass is redistributed uniformly (hand-computed, 1 iteration)") {
    // 1→2, node 2 dangling. r0 = (.5, .5); dangling mass dm = .5
    // pr1' = .15/2 + .85*(0  + .25) = .2875
    // pr2' = .15/2 + .85*(.5 + .25) = .7125
    val pr = Graph
      .pageRank(nodes(1L, 2L), edges(1L -> 2L), iterations = 1)
      .collect()
      .map(r => r.getLong(0) -> r.getDouble(1))
      .toMap
    assert(math.abs(pr(1L) - 0.2875) < 1e-15)
    assert(math.abs(pr(2L) - 0.7125) < 1e-15)
  }

  test("rank is conserved: Σpr = 1 with dangling nodes and multiple iterations") {
    // star + dangling leaves: mass leaks nowhere
    val pr = Graph
      .pageRank(
        nodes(0L, 1L, 2L, 3L, 4L),
        edges(1L -> 0L, 2L -> 0L, 3L -> 0L, 4L -> 0L), // 0 is dangling
        iterations = 6)
      .agg(sum($"pr"))
      .head()
      .getDouble(0)
    assert(math.abs(pr - 1.0) < 1e-9)
  }

  test("degrees keeps zero-degree nodes and counts parallel structure exactly") {
    val d = Graph
      .degrees(nodes(1L, 2L, 3L, 4L), edges(1L -> 2L, 1L -> 3L, 2L -> 3L))
      .collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2))))
      .toMap
    assert(d(1L) == ((2L, 0L)))
    assert(d(2L) == ((1L, 1L)))
    assert(d(3L) == ((0L, 2L)))
    assert(d(4L) == ((0L, 0L))) // isolated node survives the left joins
  }

  test("reliable-checkpoint arm produces identical ranks") {
    val dir = java.nio.file.Files.createTempDirectory("graph-ckpt").toString
    val ns = nodes(1L, 2L, 3L, 4L)
    val es = edges(1L -> 2L, 2L -> 3L, 3L -> 1L, 4L -> 1L)
    val local = Graph.pageRank(ns, es, iterations = 3).collect()
      .map(r => r.getLong(0) -> r.getDouble(1)).toMap
    val reliable = Graph.pageRank(ns, es, iterations = 3, checkpointDir = Some(dir))
      .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    assert(local == reliable) // bit-identical: same plan, same decimal sums
  }

  test("hostRank folds page ranks to hosts with an exact decimal sum") {
    val pr = Seq((1L, 0.25), (2L, 0.25), (3L, 0.5)).toDF("id", "pr")
    val pages = Seq((1L, "a"), (2L, "a"), (3L, "b")).toDF("id", "host")
    val hr = Graph.hostRank(pr, pages).collect()
      .map(r => r.getString(0) -> ((r.getDouble(1), r.getLong(2)))).toMap
    assert(hr("a") == ((0.5, 2L)))
    assert(hr("b") == ((0.5, 1L)))
  }
}
