package graft

import graft.operators.Sketches
import org.apache.spark.sql.functions._

/** Mergeable-sketch accuracy + algebra contracts (operators/Sketches).
  * These pin what the benchDefs rows (q_hll_tokens, q_theta_overlap)
  * can't oracle-check: estimate accuracy vs exact, and the
  * merge-losslessness that makes the persisted-shard-sketch pattern
  * sound at 100 TB.
  */
class SketchesSpec extends SparkSpec {
  import spark.implicits._

  private lazy val docs = {
    // 2k synthetic docs over a ~1.2k-word zipf-ish vocabulary: big
    // enough that HLL at lgK=12 is in its estimation regime for the
    // token set, small enough for a spec.
    (0 until 2000)
      .map { i =>
        val words = (0 until 20).map { j =>
          val r = (i * 37 + j * 101) % 1500
          s"w${r * r % 1201}"
        }
        (i.toLong, words.mkString(" "), if (i % 3 == 0) "a" else "b")
      }
      .toDF("doc_id", "text", "source")
  }

  test("hll shard-merge estimate is within 5% of exact distinct") {
    val toks = Sketches.explodedTokens(
      docs.withColumn("shard", (col("doc_id") % 8).cast("int")),
      "text",
      Seq("source", "shard"))
    val est = Sketches
      .hllMergeEstimate(
        Sketches.hllShardSketches(toks, Seq("source", "shard"), "token"),
        Seq("source"))
      .collect()
      .map(r => r.getString(0) -> r.getLong(1))
      .toMap
    val exact = toks
      .groupBy("source")
      .agg(countDistinct(col("token")).as("n"))
      .collect()
      .map(r => r.getString(0) -> r.getLong(1))
      .toMap
    assert(est.keySet == exact.keySet)
    for ((src, ex) <- exact) {
      val e = est(src)
      assert(
        math.abs(e - ex).toDouble / ex < 0.05,
        s"source=$src est=$e exact=$ex")
    }
  }

  test("hll union of shard sketches equals the unsharded sketch (lossless merge)") {
    val toks = Sketches.explodedTokens(
      docs.withColumn("shard", (col("doc_id") % 8).cast("int")),
      "text",
      Seq("shard"))
    val viaShards = Sketches
      .hllMergeEstimate(
        Sketches.hllShardSketches(toks, Seq("shard"), "token"),
        Seq.empty)
      .head()
      .getLong(0)
    val direct = toks
      .agg(hll_sketch_estimate(hll_sketch_agg(col("token"), Sketches.DefaultLgK))
        .as("distinct_est"))
      .head()
      .getLong(0)
    assert(viaShards == direct, s"sharded=$viaShards direct=$direct")
  }

  test("theta overlap estimates intersection within 10% of exact") {
    val train = Sketches.explodedTokens(docs.filter($"doc_id" % 10 =!= 0), "text")
    val eval = Sketches.explodedTokens(docs.filter($"doc_id" % 10 === 0), "text")
    val row = Sketches.thetaOverlap(train, eval, "token").head()
    val estInter = row.getAs[Long]("est_intersection").toDouble
    val exactInter = train
      .select("token")
      .distinct()
      .join(eval.select("token").distinct(), "token")
      .count()
      .toDouble
    assert(
      math.abs(estInter - exactInter) / exactInter < 0.10,
      s"est=$estInter exact=$exactInter")
    // algebra sanity: |∩| ≤ min side, |∪| ≥ max side, 0 ≤ jaccard ≤ containment ≤ 1
    val estL = row.getAs[Long]("est_left").toDouble
    val estR = row.getAs[Long]("est_right").toDouble
    assert(estInter <= math.min(estL, estR) * 1.05)
    assert(row.getAs[Long]("est_union").toDouble >= math.max(estL, estR) * 0.95)
    val j = row.getAs[Double]("jaccard_est")
    val c = row.getAs[Double]("containment_est")
    assert(j >= 0 && j <= c && c <= 1.0001, s"jaccard=$j containment=$c")
  }

  test("cms probe never undercounts and respects the eps bound on hot tokens") {
    val toks = Sketches.explodedTokens(docs, "text")
    val total = toks.count()
    val eps = 0.001
    val sketch = Sketches.cmsSketch(toks, "token", eps = eps, confidence = 0.99)
    val exactTop = toks
      .groupBy("token")
      .count()
      .orderBy(desc("count"), col("token"))
      .limit(20)
      .collect()
      .map(r => r.getString(0) -> r.getLong(1))
    val probed = Sketches.cmsProbe(sketch, exactTop.map(_._1).toSeq).toMap
    for ((tok, exact) <- exactTop) {
      val est = probed(tok)
      assert(est >= exact, s"CMS undercounted $tok: est=$est exact=$exact")
      assert(
        est <= exact + (eps * total).ceil.toLong,
        s"CMS overcounted $tok beyond eps bound: est=$est exact=$exact total=$total")
    }
  }

  test("rolling distinct tracks the exact trailing-window count within 5%") {
    // 30 days, each day i active users = ids in [i*7, i*7 + 300): heavy
    // overlap day-to-day, so WAU << 7×DAU — the case a naive sum gets wrong
    val events = (0 until 30)
      .flatMap { d =>
        (0 until 300).map(u =>
          (java.sql.Timestamp.valueOf(f"2024-03-${d + 1}%02d 12:00:00"),
            (d * 7 + u).toLong))
      }
      .toDF("ts", "user_id")
    val est = Sketches
      .rollingDistinct(events, "ts", "user_id", windowDays = 7)
      .collect()
      .map(r => r.getAs[java.sql.Date]("day").toString -> r.getLong(1))
      .toMap
    assert(est.size == 30, s"one row per observed day, no phantom days: ${est.size}")
    for (d <- 0 until 30) {
      val lo = math.max(0, d - 6) * 7
      val exact = (d * 7 + 300) - lo // ids form one contiguous range
      val day = f"2024-03-${d + 1}%02d"
      assert(math.abs(est(day) - exact).toDouble / exact < 0.05,
        s"day=$day est=${est(day)} exact=$exact")
    }
  }

  test("sketch estimates are deterministic across runs") {
    val toks = Sketches.explodedTokens(docs, "text")
    def hllOnce(): Long =
      Sketches
        .hllMergeEstimate(
          Sketches.hllShardSketches(
            toks.withColumn("shard", lit(0)), Seq("shard"), "token"),
          Seq.empty)
        .head()
        .getLong(0)
    assert(hllOnce() == hllOnce())
    def thetaOnce(): Double =
      Sketches.thetaOverlap(toks, toks, "token").head().getAs[Double]("jaccard_est")
    assert(thetaOnce() == thetaOnce())
  }
}
