package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

/** Per-key distributional anomaly detection over metric streams — the
  * batch face of the monitoring queries the reference runs as push-mode
  * KSQL aggregates (ref: src/Query/Builders/ProjectionBuilder.cs
  * Sum/Count/Avg map; the reference stops at the aggregate, flagging is
  * client-side). Here flagging is part of the plan.
  *
  * Determinism contract (this is oracle-gated): the per-key moments are
  * accumulated in DECIMAL, so `s1`/`s2` are EXACT — independent of
  * partitioning and summation order — and every downstream double op
  * (sub/div/sqrt) is IEEE-correctly-rounded, giving bit-identical
  * z-scores on any engine that sums the same decimals. A plain double
  * `avg`/`stddev` would drift with partition count and flip rounded
  * values near bucket boundaries (see QueryPack conventions).
  *
  * Scale shape: ONE map-side-combinable hash aggregate over the metric
  * (3 decimal/long cells per key), broadcast of the key-cardinality
  * stats table back onto the scan, and a scan-local filter — the corpus
  * is read once and never shuffles. Keys here are type/category-like
  * (bounded cardinality); for unbounded keys swap the broadcast for a
  * shuffled join, the moments math is unchanged.
  */
object Anomaly {

  /** Rows whose `valueCol` deviates more than `threshold` sample
    * standard deviations from their `keyCol` group mean. Keeps
    * `keepCols`, appends `z` rounded to 6 dp.
    */
  def zScoreOutliers(
      df: DataFrame,
      keyCol: String,
      valueCol: String,
      keepCols: Seq[String],
      threshold: Double = 2.5
  ): DataFrame = {
    require(threshold > 0, "threshold must be positive")
    val vd = col(valueCol).cast(DecimalType(18, 6))
    val stats = df
      .groupBy(col(keyCol))
      .agg(
        sum(vd).cast("double").as("__s1"),
        sum(vd * vd).cast("double").as("__s2"),
        count(lit(1)).as("__n"))
      // degenerate groups (n = 1, or zero variance) have no defined z.
      // Exclude them EXPLICITLY rather than riding on divide-by-zero
      // semantics: Spark yields NULL (row silently filtered), DuckDB
      // yields NaN — and NaN sorts ABOVE the threshold there, so the
      // two engines would diverge the first time a singleton or
      // constant-valued key appears. The moments are exact decimals
      // cast to double, so the variance-numerator comparison is
      // bit-identical across engines.
      .filter(
        col("__n") > 1 &&
          (col("__s2") - col("__s1") * col("__s1") / col("__n")) > 0)
    val mean = col("__s1") / col("__n")
    val variance =
      (col("__s2") - col("__s1") * col("__s1") / col("__n")) / (col("__n") - 1)
    val z = (col(valueCol) - mean) / sqrt(variance)
    df.join(broadcast(stats), keyCol)
      .filter(abs(z) > threshold)
      .select(keepCols.map(col) :+ col(keyCol) :+ col(valueCol) :+
        round(z, 6).as("z"): _*)
  }

  /** Population-stability-index drift report between a reference and a
    * current snapshot of `valueCol`, over fixed `binEdges` (the
    * monitoring question behind every retraining trigger: "did the
    * corpus distribution move?"). One row per bin:
    * `psi_term = (p_cur − p_ref) · ln(p_cur / p_ref)`; Σ psi_term is the
    * PSI (common rule of thumb: < 0.1 stable, > 0.25 shifted).
    *
    * Laplace smoothing (+1 per bin) keeps empty bins finite AND keeps
    * every proportion a ratio of exact longs — so, as in
    * [[zScoreOutliers]], the only cross-engine wobble is libm `ln`,
    * absorbed by the 6-dp round (QueryPack conventions).
    *
    * Scale shape: each side is ONE map-side-combinable count aggregate
    * over bounded bins (the bin fold is a scan-local CASE chain), then a
    * bins-sized broadcast-able join — the snapshots are read once and
    * never shuffle.
    */
  def psiDrift(
      ref: DataFrame,
      cur: DataFrame,
      valueCol: String,
      binEdges: Seq[Double]
  ): DataFrame =
    psiFromCounts(
      binCounts(ref, valueCol, binEdges),
      binCounts(cur, valueCol, binEdges))

  /** Dense per-bin counts of `valueCol` under `binEdges` — the
    * persistable half of [[psiDrift]] (a drift monitor seeds the
    * reference side ONCE and re-uses it per batch —
    * [[graft.streaming.DriftMonitor]]). Bin i = #edges ≤ v: the CASE
    * chain checks the LARGEST edge first, codegen'd scan math; the
    * dense 0..|edges| frame keeps empty bins present.
    */
  def binCounts(
      df: DataFrame,
      valueCol: String,
      binEdges: Seq[Double]
  ): DataFrame = {
    require(binEdges.nonEmpty && binEdges == binEdges.sorted && binEdges.distinct == binEdges,
      "binEdges must be non-empty, sorted, distinct")
    val bin = binEdges.zipWithIndex.reverse
      .foldLeft(Option.empty[Column]) { case (acc, (e, i)) =>
        Some(acc.fold(when(col(valueCol) >= e, lit(i + 1)))(
          _.when(col(valueCol) >= e, lit(i + 1))))
      }
      .get
      .otherwise(lit(0))
      .as("bin")
    val bins = df.sparkSession
      .range(0, binEdges.length + 1)
      .select(col("id").cast("int").as("bin"))
    bins
      .join(
        df.select(bin).groupBy(col("bin")).agg(count(lit(1)).as("cnt")),
        Seq("bin"), "left")
      .na.fill(0L, Seq("cnt"))
  }

  /** Embedding-space drift between two snapshots: per-key cosine of the
    * mean vectors — PSI watches the SCALAR distributions, this watches
    * the semantic space itself (an embedding-model swap or a topic
    * shift moves centroids long before any scalar histogram does).
    *
    * cos(mean_r, mean_u) = cos(sum_r, sum_u) — the 1/n factors cancel —
    * so everything accumulates in DECIMAL (exact, partitioning-
    * independent: components sum in (18,9), the sum-vector narrows to
    * (13,9) so products and their 64-dim sums stay inside Spark's
    * 38-digit cap) and the only doubles are one division and two
    * correctly-rounded sqrts at the very end. A float/double
    * accumulation would drift with summation order (QueryPack rules).
    *
    * Scale shape: posexplode → ONE (key, pos)-keyed hash agg per side
    * (map-side combinable), then key×dim-sized joins and aggregates —
    * the corpora are read once. The exchange carries (key, pos, 16 B)
    * per row; for very wide vectors a typed vector-sum aggregate would
    * shrink it dim-fold, but the declarative form keeps the whole plan
    * inside codegen'd hash aggregates.
    */
  def centroidDrift(
      ref: DataFrame,
      cur: DataFrame,
      keyCol: String,
      vecCol: String
  ): DataFrame = {
    def sumVec(df: DataFrame, name: String): DataFrame =
      df.select(col(keyCol), posexplode(col(vecCol)).as(Seq("pos", "__x")))
        .select(col(keyCol), col("pos"),
          col("__x").cast(DecimalType(18, 9)).as("__xd"))
        .groupBy(col(keyCol), col("pos"))
        .agg(sum(col("__xd")).cast(DecimalType(13, 9)).as(name))
    sumVec(ref, "__sr")
      .join(sumVec(cur, "__su"), Seq(keyCol, "pos"))
      .groupBy(col(keyCol))
      .agg(
        sum(col("__sr") * col("__su")).cast("double").as("__dot"),
        sum(col("__sr") * col("__sr")).cast("double").as("__nr"),
        sum(col("__su") * col("__su")).cast("double").as("__nu"),
        count(lit(1)).cast("int").as("dim"))
      .select(
        col(keyCol),
        round(col("__dot") / (sqrt(col("__nr")) * sqrt(col("__nu"))), 6)
          .as("centroid_cos"),
        col("dim"))
  }

  /** Pearson chi-square independence test between two categorical
    * columns (are `source` and `lang` independent? — the mix-shift
    * diagnostic behind sampling-bias checks). One row per observed
    * cell: observed, expected = row·col/n, and the χ² contribution;
    * Σ chi2_term is the statistic. All inputs to the doubles are exact
    * longs (one count aggregate + two rollups of it), so results are
    * engine-exact up to the 6-dp round.
    *
    * Scale shape: ONE corpus count aggregate; everything after is
    * cells-sized (|A|·|B| frames, joins on the tiny count table).
    */
  def chiSquareIndependence(
      df: DataFrame,
      colA: String,
      colB: String
  ): DataFrame = {
    val o = df.groupBy(col(colA), col(colB)).agg(count(lit(1)).as("obs"))
    val rt = o.groupBy(col(colA)).agg(sum(col("obs")).as("__r"))
    val ct = o.groupBy(col(colB)).agg(sum(col("obs")).as("__c"))
    val n = o.agg(sum(col("obs")).cast("double").as("__n"))
    val e = col("__r") * col("__c") / col("__n")
    o.join(rt, colA)
      .join(ct, colB)
      .crossJoin(broadcast(n))
      .select(
        col(colA), col(colB), col("obs"),
        round(e, 6).as("expected"),
        round(pow(col("obs") - e, 2) / e, 6).as("chi2_term"))
  }

  /** Shannon entropy of `valCol`'s distribution within each `keyCol`
    * group (nats) — the collapse detector: a source whose language/
    * topic entropy drops is feeding duplicates or a stuck upstream.
    * Counts are exact; ln is libm, absorbed by the 6-dp round.
    *
    * Scale shape: one corpus count aggregate, then group-sized math.
    */
  def valueEntropy(
      df: DataFrame,
      keyCol: String,
      valCol: String
  ): DataFrame = {
    val c = df.groupBy(col(keyCol), col(valCol)).agg(count(lit(1)).as("__cnt"))
    val t = c.groupBy(col(keyCol)).agg(sum(col("__cnt")).as("__tot"))
    val p = col("__cnt") / col("__tot").cast("double")
    c.join(t, keyCol)
      .groupBy(col(keyCol))
      .agg(
        round(-sum(p * log(p)), 6).as("entropy"),
        count(lit(1)).cast("int").as("n_values"))
  }

  /** PSI math over two (dense, same-binning) count tables from
    * [[binCounts]] — bins-sized frames only, no snapshot access.
    */
  def psiFromCounts(refCounts: DataFrame, curCounts: DataFrame): DataFrame = {
    val joined = refCounts
      .select(col("bin"), col("cnt").as("__cr"))
      .join(curCounts.select(col("bin"), col("cnt").as("__cc")), Seq("bin"))
    // totals from the (bins-sized) count tables, NOT a snapshot scan;
    // +nBins is the Laplace mass
    val totals = joined.agg(
      (sum(col("__cr")) + count(lit(1))).cast("double").as("__tr"),
      (sum(col("__cc")) + count(lit(1))).cast("double").as("__tc"))
    val pRef = (col("__cr") + 1) / col("__tr")
    val pCur = (col("__cc") + 1) / col("__tc")
    joined
      .crossJoin(broadcast(totals))
      .select(
        col("bin"),
        col("__cr").as("n_ref"),
        col("__cc").as("n_cur"),
        round(pCur - pRef, 6).as("dp"),
        round((pCur - pRef) * log(pCur / pRef), 6).as("psi_term"))
  }
}
