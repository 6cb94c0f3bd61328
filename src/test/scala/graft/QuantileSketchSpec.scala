package graft

import graft.functions.KllSketch
import graft.operators.Sketches
import org.apache.spark.sql.functions._

/** KLL quantile-sketch contracts (functions/KllSketch,
  * Sketches.kll*): the exactness window the DuckDB-gated queries rely
  * on, the O(1/k) rank-error bound in the genuinely-approximate regime,
  * shard-merge consistency (the persisted-sketch pattern), wire
  * round-trip, and determinism.
  */
class QuantileSketchSpec extends SparkSpec {
  import spark.implicits._

  /** Deterministic "shuffled" doubles: LCG-permuted, value range [0, 1M). */
  private def stream(n: Int): IndexedSeq[Double] =
    (0 until n).map(i => ((i.toLong * 48271) % 1000003).toDouble)

  private def exactDisc(sorted: IndexedSeq[Double], q: Double): Double =
    sorted(math.max(1, math.ceil(q * sorted.length).toInt) - 1)

  test("exact window: no compaction while n <= k, quantiles match quantile_disc") {
    val xs = stream(500)
    val sk = KllSketch(512)
    xs.foreach(sk.update)
    val sorted = xs.sorted
    val probs = Array(0.01, 0.25, 0.5, 0.75, 0.9, 0.99, 1.0)
    val got = sk.quantiles(probs)
    probs.zipWithIndex.foreach { case (q, i) =>
      assert(got(i) == exactDisc(sorted, q), s"q=$q")
    }
  }

  test("approximate regime: rank error <= 2.5% at k=200 over 100k values") {
    val xs = stream(100000)
    val sk = KllSketch(200)
    xs.foreach(sk.update)
    val sorted = xs.sorted
    val probs = Array(0.01, 0.1, 0.25, 0.5, 0.75, 0.9, 0.99)
    val got = sk.quantiles(probs)
    probs.zipWithIndex.foreach { case (q, i) =>
      // rank of the returned value vs the requested rank
      val rank = sorted.search(got(i)).insertionPoint.toDouble / sorted.length
      assert(math.abs(rank - q) <= 0.025, s"q=$q got rank $rank (${got(i)})")
    }
    // retained size is k-bounded, not n-bounded (the 100 TB contract)
    val retained = sk.levels.map(_.length).sum
    assert(retained <= 3 * 200, s"retained $retained items for n=100k")
  }

  test("merge of shard sketches tracks the whole-stream sketch's error bound") {
    val xs = stream(80000)
    val shards = xs.grouped(10000).map { chunk =>
      val s = KllSketch(200); chunk.foreach(s.update); s
    }
    val merged = shards.reduce { (a, b) => a.merge(b); a }
    assert(merged.n == 80000)
    val sorted = xs.sorted
    val probs = Array(0.1, 0.5, 0.9, 0.99)
    val got = merged.quantiles(probs)
    probs.zipWithIndex.foreach { case (q, i) =>
      val rank = sorted.search(got(i)).insertionPoint.toDouble / sorted.length
      assert(math.abs(rank - q) <= 0.03, s"q=$q got rank $rank")
    }
  }

  test("serialize/deserialize round-trips state and further updates agree") {
    val sk = KllSketch(64)
    stream(5000).foreach(sk.update)
    val back = KllSketch.deserialize(sk.serialize())
    assert(back.n == sk.n)
    assert(back.quantiles(Array(0.5, 0.9)).toSeq ==
      sk.quantiles(Array(0.5, 0.9)).toSeq)
    // identical continued evolution — the LCG state rode the wire too
    stream(1000).foreach { v => sk.update(v + 7); back.update(v + 7) }
    assert(back.quantiles(Array(0.5, 0.9)).toSeq ==
      sk.quantiles(Array(0.5, 0.9)).toSeq)
  }

  test("determinism: same input twice, bit-identical sketch bytes") {
    def build() = { val s = KllSketch(128); stream(20000).foreach(s.update); s }
    assert(java.util.Arrays.equals(build().serialize(), build().serialize()))
  }

  test("dataframe path: grouped kll quantiles stay hash-aggregated and exact under k") {
    val df = (0 until 3000)
      .map(i => (s"g${i % 3}", ((i.toLong * 48271) % 100000).toDouble))
      .toDF("g", "v")
    val out = df
      .groupBy(col("g"))
      .agg(Sketches.kllQuantilesCol(col("v"), Seq(0.5, 0.9), k = 2048).as("qs"))
      .select(col("g"), element_at(col("qs"), 1).as("p50"),
        element_at(col("qs"), 2).as("p90"))
      .orderBy(col("g"))
    val plan = out.queryExecution.executedPlan.toString
    assert(plan.contains("ObjectHashAggregate"), plan)
    val rows = out.collect()
    val byG = (0 until 3000)
      .map(i => (s"g${i % 3}", ((i.toLong * 48271) % 100000).toDouble))
      .groupBy(_._1).view.mapValues(_.map(_._2).sorted.toIndexedSeq).toMap
    rows.foreach { r =>
      val sorted = byG(r.getString(0))
      assert(r.getDouble(1) == exactDisc(sorted, 0.5), r.toString)
      assert(r.getDouble(2) == exactDisc(sorted, 0.9), r.toString)
    }
  }

  test("shard-sketch write + merge read: exact under k, null-free, group rollup") {
    val df = (0 until 4000)
      .map(i => (s"s${i % 4}", ((i / 4) % 8).toString, ((i.toLong * 7919) % 65536).toDouble))
      .toDF("source", "shard", "v")
    val sketches = Sketches.kllShardSketches(df, Seq("source", "shard"), "v", k = 4096)
    assert(sketches.count() == 32)
    val rolled = Sketches
      .kllMergeQuantiles(sketches, Seq("source"), Seq(0.5, 0.99))
      .orderBy(col("source"))
      .collect()
    val byS = (0 until 4000)
      .map(i => (s"s${i % 4}", ((i.toLong * 7919) % 65536).toDouble))
      .groupBy(_._1).view.mapValues(_.map(_._2).sorted.toIndexedSeq).toMap
    rolled.foreach { r =>
      val sorted = byS(r.getString(0))
      assert(r.getDouble(1) == exactDisc(sorted, 0.5), r.toString)
      assert(r.getDouble(2) == exactDisc(sorted, 0.99), r.toString)
    }
  }
}
