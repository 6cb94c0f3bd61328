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

  test("HyperBall on a path graph: exact balls and harmonic in sparse mode") {
    // 1→2→3: B(3)={1,2,3}, harmonic(3)=1/1+1/2; HLL is exact at these
    // cardinalities (sparse mode), so the pins are tight
    val hc = Graph
      .harmonicCentrality(nodes(1L, 2L, 3L), edges(1L -> 2L, 2L -> 3L), maxRadius = 10)
      .collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getDouble(2))))
      .toMap
    assert(hc(1L) == ((1L, 0.0)))
    assert(hc(2L)._1 == 2L && math.abs(hc(2L)._2 - 1.0) < 1e-9)
    assert(hc(3L)._1 == 3L && math.abs(hc(3L)._2 - 1.5) < 1e-9)
  }

  test("neighbourhood function on a path: exact N(r) ladder and effective diameter") {
    // 0→1→2→3→4: in-balls grow one hop per radius, so
    // N(0)=5, N(1)=9, N(2)=12, N(3)=14, N(4)=15 (all-pairs reach);
    // eff_diameter(0.9): first r with N(r) ≥ 13.5 → 3. HLL is exact at
    // these cardinalities, so the pins are tight.
    val nf = Graph
      .neighborhoodFunction(
        nodes(0L, 1L, 2L, 3L, 4L),
        edges(0L -> 1L, 1L -> 2L, 2L -> 3L, 3L -> 4L),
        maxRadius = 10)
      .orderBy(col("radius"))
      .collect()
      .map(r => (r.getInt(0), r.getLong(1), r.getDouble(2), r.getInt(3)))
    assert(nf.map(x => x._1 -> x._2).toSeq ==
      Seq(0 -> 5L, 1 -> 9L, 2 -> 12L, 3 -> 14L, 4 -> 15L))
    assert(nf.forall(_._4 == 3))
    assert(math.abs(nf.last._3 - 1.0) < 1e-12)
    // monotone non-decreasing reach
    assert(nf.sliding(2).forall(w => w(0)._2 <= w(1)._2))
  }

  test("neighbourhood function with no edges: a single radius-0 row, diameter 0") {
    val nf = Graph
      .neighborhoodFunction(nodes(1L, 2L, 3L), edges(), maxRadius = 5)
      .collect()
      .map(r => (r.getInt(0), r.getLong(1), r.getInt(3)))
    assert(nf.toSeq == Seq((0, 3L, 0)))
  }

  test("HyperBall matches exact BFS harmonic centrality on a funnel+hub digraph") {
    val n = 40
    val es = (0 until n).flatMap { i =>
      Seq((i.toLong, ((i / 3 + 7) % n).toLong), (i.toLong, (i % 5).toLong))
    }.filter { case (s, d) => s != d }.distinct
    // exact: BFS over out-edges from every source u gives d(u, v)
    val adj = es.groupBy(_._1).map { case (s, ps) => s -> ps.map(_._2) }
    val exact = Array.fill(n)(0.0)
    for (u <- 0 until n) {
      val dist = scala.collection.mutable.Map(u.toLong -> 0)
      var frontier = List(u.toLong)
      while (frontier.nonEmpty) {
        frontier = frontier.flatMap(x => adj.getOrElse(x, Nil).filter(!dist.contains(_)).map { y =>
          dist(y) = dist(x) + 1; y
        })
      }
      for ((v, d) <- dist if d > 0) exact(v.toInt) += 1.0 / d
    }
    val hc = Graph
      .harmonicCentrality((0L until n.toLong).toDF("id"), es.toDF("src", "dst"))
      .collect()
      .map(r => r.getLong(0) -> r.getDouble(2))
      .toMap
    for (v <- 0 until n)
      assert(
        math.abs(hc(v.toLong) - exact(v)) <= math.max(0.05 * exact(v), 0.05),
        s"node $v: hyperball=${hc(v.toLong)} exact=${exact(v)}")
  }

  test("TrustRank: teleport flows to the seed distribution (hand-computed)") {
    // 1→2→3, seeds={1}: r0=(1,0,0)
    // iter1: c=(0,1,0), dm=pr3=0 → r1=(.15, .85, 0)
    // iter2: c=(0,.15,.85), dm=0 → r2=(.15, .1275, .7225)
    import spark.implicits._
    val reset = Seq((1L, 1.0), (2L, 0.0), (3L, 0.0)).toDF("id", "reset")
    val pr = Graph
      .pageRank(nodes(1L, 2L, 3L), edges(1L -> 2L, 2L -> 3L), iterations = 2,
        reset = Some(reset))
      .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    assert(math.abs(pr(1L) - 0.15) < 1e-15)
    assert(math.abs(pr(2L) - 0.1275) < 1e-15)
    assert(math.abs(pr(3L) - 0.7225) < 1e-15)
  }

  test("TrustRank: dangling mass returns to the seeds, not uniformly") {
    // 1→2, node 2 dangling, seeds={1}: r0=(1,0)
    // iter1: c=(0,1), dm=pr2=0 → r1=(.15,.85)
    // iter2: c=(0,.15), dm=pr2=.85 → r2=(.15+.85·.85, .85·.15)=(.8725,.1275)
    import spark.implicits._
    val reset = Seq((1L, 1.0), (2L, 0.0)).toDF("id", "reset")
    val pr = Graph
      .pageRank(nodes(1L, 2L), edges(1L -> 2L), iterations = 2, reset = Some(reset))
      .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    assert(math.abs(pr(1L) - 0.8725) < 1e-15)
    assert(math.abs(pr(2L) - 0.1275) < 1e-15)
    assert(math.abs(pr.values.sum - 1.0) < 1e-15)
  }

  test("pageRank agrees with an in-memory reference on seeded random graphs") {
    // randomized-equivalence discipline (IntervalJoinSpec style):
    // arbitrary digraphs incl. dangling nodes, isolated nodes, cycles
    val rnd = new scala.util.Random(42)
    for (trial <- 1 to 6) {
      val n = 2 + rnd.nextInt(20)
      val es = Seq.fill(rnd.nextInt(3 * n))((rnd.nextInt(n).toLong, rnd.nextInt(n).toLong))
        .filter { case (s, d) => s != d }.distinct
      val iters = 1 + rnd.nextInt(4)
      // reference: dense in-memory power iteration, same semantics
      val adj = es.groupBy(_._1).map { case (s, ps) => s -> ps.map(_._2) }
      var pr = Array.fill(n)(1.0 / n)
      for (_ <- 1 to iters) {
        val contrib = Array.fill(n)(0.0)
        var dm = 0.0
        for (u <- 0 until n) adj.get(u.toLong) match {
          case Some(ds) => ds.foreach(d => contrib(d.toInt) += pr(u) / ds.size)
          case None     => dm += pr(u)
        }
        pr = Array.tabulate(n)(v => 0.15 / n + 0.85 * (contrib(v) + dm / n))
      }
      val spark0 = Graph
        .pageRank((0L until n.toLong).toDF("id"), es.toDF("src", "dst"), iters)
        .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
      assert(spark0.size == n, s"trial $trial: missing nodes")
      assert(math.abs(spark0.values.sum - 1.0) < 1e-9, s"trial $trial: mass not conserved")
      for (v <- 0 until n)
        assert(
          math.abs(spark0(v.toLong) - pr(v)) < 1e-9,
          s"trial $trial node $v (n=$n iters=$iters): spark=${spark0(v.toLong)} ref=${pr(v)}")
    }
  }

  test("cached pre-partitioned edges join without an edge-side exchange") {
    // the pageRank/harmonic scale contract: the edge list is shuffled
    // ONCE (before the checkpoint), every iteration's join reuses that
    // partitioning and only the node-sized rank frame moves. If
    // checkpoint stopped preserving outputPartitioning this would plan
    // two exchanges and the operators silently pay |E| per iteration.
    // force the shuffled-join path (at real scale the rank frame is far
    // past any broadcast threshold)
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try {
      val es = (0L until 200L).map(i => (i, (i * 7 + 3) % 200)).toDF("src", "dst")
      val weighted = es.repartition(col("src")).persist()
      weighted.count()
      val ranks = (0L until 200L).map(i => (i, 1.0 / 200)).toDF("id", "pr")
      val joined = weighted.join(ranks, weighted("src") === ranks("id"))
        .groupBy(weighted("dst")).agg(sum(col("pr")).as("c"))
      val plan = joined.queryExecution.executedPlan.toString
      // the one-time cache-fill shuffle prints as REPARTITION_BY_COL
      // inside the InMemoryRelation; live per-query shuffles are the
      // ENSURE_REQUIREMENTS exchanges: ranks side + groupBy(dst) — NOT
      // an edge-side re-shuffle (which would make it 3)
      val exchanges = "ENSURE_REQUIREMENTS".r.findAllIn(plan).size
      assert(exchanges == 2, s"expected 2 live exchanges (ranks + agg), got $exchanges:\n$plan")
    } finally spark.conf.unset("spark.sql.autoBroadcastJoinThreshold")
  }

  test("labelPropagation: two triangles joined by a bridge (hand-traced rounds)") {
    // 1-2-3 and 4-5-6 triangles, bridge 3-4, undirected. Synchronous
    // min-tie-break trace: r1=[2,1,1,3,4,4], r2=[1,1,1,4,3,3],
    // r3=[1,1,1,3,3,3], r4 stable — each triangle collapses to its
    // min-reachable label, the bridge does not merge them.
    val lp = Graph
      .labelPropagation(
        nodes(1L, 2L, 3L, 4L, 5L, 6L),
        edges(1L -> 2L, 2L -> 3L, 3L -> 1L, 4L -> 5L, 5L -> 6L, 6L -> 4L, 3L -> 4L),
        rounds = 4)
      .collect()
      .map(r => r.getLong(0) -> r.getLong(1))
      .toMap
    assert(lp == Map(1L -> 1L, 2L -> 1L, 3L -> 1L, 4L -> 3L, 5L -> 3L, 6L -> 3L))
  }

  test("labelPropagation: ties take the smallest label; isolated nodes keep their own") {
    // star 2-1-3 after one round: node 1 sees {2,3} once each → 2;
    // leaves see {1} → 1; node 9 has no edges → keeps 9
    val lp = Graph
      .labelPropagation(nodes(1L, 2L, 3L, 9L), edges(1L -> 2L, 1L -> 3L), rounds = 1)
      .collect()
      .map(r => r.getLong(0) -> r.getLong(1))
      .toMap
    assert(lp == Map(1L -> 2L, 2L -> 1L, 3L -> 1L, 9L -> 9L))
  }

  test("labelPropagation directed mode votes over in-edges only") {
    // 1→2, 1→3, symmetrize=false: node 1 has no in-edges → keeps 1;
    // 2 and 3 adopt 1. (Symmetrized, node 1 would adopt 2 — prior test.)
    val lp = Graph
      .labelPropagation(
        nodes(1L, 2L, 3L), edges(1L -> 2L, 1L -> 3L), rounds = 1, symmetrize = false)
      .collect()
      .map(r => r.getLong(0) -> r.getLong(1))
      .toMap
    assert(lp == Map(1L -> 1L, 2L -> 1L, 3L -> 1L))
  }

  test("labelPropagation reliable-checkpoint arm is identical") {
    val dir = java.nio.file.Files.createTempDirectory("lpa-ckpt").toString
    val ns = nodes(1L, 2L, 3L, 4L, 5L, 6L)
    val es = edges(1L -> 2L, 2L -> 3L, 3L -> 1L, 4L -> 5L, 5L -> 6L, 6L -> 4L, 3L -> 4L)
    val local = Graph.labelPropagation(ns, es, rounds = 3).collect().toSet
    val reliable =
      Graph.labelPropagation(ns, es, rounds = 3, checkpointDir = Some(dir)).collect().toSet
    assert(local.map(r => (r.getLong(0), r.getLong(1))) ==
      reliable.map(r => (r.getLong(0), r.getLong(1))))
  }

  test("randomWalks: deg-1 cycle walks the cycle; dangling node stops the walk") {
    // 1→2→3→1: every hop has one choice regardless of mix
    val w = Graph
      .randomWalks(edges(1L -> 2L, 2L -> 3L, 3L -> 1L), nodes(1L), length = 4)
      .collect()
    assert(w.length == 1)
    assert(w.head.getSeq[Long](1) == Seq(1L, 2L, 3L, 1L, 2L))
    // 1→2, 2 dangling: the walk from 1 stops after one hop, from 2 immediately
    val stopped = Graph
      .randomWalks(edges(1L -> 2L), nodes(1L, 2L), length = 3)
      .collect()
      .map(r => r.getLong(0) -> r.getSeq[Long](1))
      .toMap
    assert(stopped(1L) == Seq(1L, 2L))
    assert(stopped(2L) == Seq(2L))
  }

  test("randomWalks lcgMix picks the hand-computed sorted-neighbor index") {
    // cur=5, t=1, seed=7: (5*1103515245 + 12345 + 7) mod 3 = 1 →
    // sorted nbrs [10,20,30] index 1 → 20
    val w = Graph
      .randomWalks(
        edges(5L -> 10L, 5L -> 20L, 5L -> 30L),
        nodes(5L),
        length = 1,
        mix = graft.operators.Walks.lcgMix(7))
      .collect()
    assert(w.head.getSeq[Long](1) == Seq(5L, 20L))
  }

  test("randomWalks hashMix emits valid deterministic walks on a random digraph") {
    val rnd = new scala.util.Random(11)
    val n = 30
    val es = Seq.fill(4 * n)((rnd.nextInt(n).toLong, rnd.nextInt(n).toLong))
      .filter { case (s, d) => s != d }.distinct
    val adj = es.groupBy(_._1).map { case (s, ps) => s -> ps.map(_._2).toSet }
    val ns = (0L until n.toLong).toDF("id")
    def run() = Graph
      .randomWalks(es.toDF("src", "dst"), ns, length = 5)
      .collect()
      .map(r => r.getLong(0) -> r.getSeq[Long](1))
      .toMap
    val walks = run()
    assert(walks.keySet == (0L until n.toLong).toSet)
    for ((start, walk) <- walks) {
      assert(walk.head == start)
      walk.sliding(2).foreach {
        case Seq(a, b) => assert(adj(a).contains(b), s"$a→$b is not an edge")
        case _         =>
      }
      // a stopped walk ends at a node with no out-edges
      if (walk.length < 6) assert(!adj.contains(walk.last))
    }
    assert(run() == walks) // hash-mix determinism across runs
  }

  test("randomWalks length-48 checkpoint truncation is pure lineage surgery") {
    // DeepWalk-typical length: truncation cadence (none / default-8 /
    // every-4 / reliable dir) must not change a single hop value
    val rnd = new scala.util.Random(23)
    val n = 40
    val es = Seq.fill(5 * n)((rnd.nextInt(n).toLong, rnd.nextInt(n).toLong))
      .filter { case (s, d) => s != d }.distinct.toDF("src", "dst")
    val ns = (0L until n.toLong).toDF("id")
    def run(every: Int, dir: Option[String] = None) = Graph
      .randomWalks(es, ns, length = 48, checkpointEvery = every, checkpointDir = dir)
      .collect()
      .map(r => r.getLong(0) -> r.getSeq[Long](1))
      .toMap
    val untruncated = run(every = 1000) // > length: zero truncation points
    assert(run(every = 8) == untruncated)
    assert(run(every = 4) == untruncated)
    val ckdir = java.nio.file.Files.createTempDirectory("walk-ckpt").toString
    assert(run(every = 8, dir = Some(ckdir)) == untruncated)
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
