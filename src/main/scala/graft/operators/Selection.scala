package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Data-selection operators for training-corpus construction: DSIR
  * importance resampling (Xie et al., "Data Selection for Language
  * Models via Importance Resampling", NeurIPS 2023) and
  * temperature-based mixture sampling (the mT5/T5 `p^alpha` domain
  * rebalance; Xue et al. 2021 §3.1).
  *
  * The reference engine has no data-selection surface (its pipeline
  * stops at KSQL-shaped queries — ref `src/Query/`); this family
  * extends the engine toward the LLM-training-data workloads the
  * 100 TB deployment exists for, next to [[Dedup]]/[[Curation]].
  *
  * Scale shape, deliberately shared across members:
  *   - the MODEL is bucket-bounded (`buckets` hashed-n-gram cells or
  *     one rate per domain) — never corpus-sized; it rides a broadcast
  *     join back onto the corpus, so the corpus itself never shuffles
  *     on model keys;
  *   - corpus passes are explode → map-side-combinable hash aggregates;
  *   - all randomness is md5-derived from row identity (the
  *     [[Curation.sampleByHash]] convention), so every engine and every
  *     run agrees row-for-row — resampling is reproducible and
  *     DuckDB-gateable.
  */
object Selection {

  /** Hashed word-n-gram bucket id in [0, buckets): md5 first 8 hex
    * digits mod buckets — the oracle-mirrorable twin of the hashed
    * n-gram featurization in DSIR §3.2 (they use 10k buckets; the
    * bucket count is a fidelity dial, not a correctness one).
    */
  def gramBucket(gram: Column, buckets: Int): Column =
    conv(substring(md5(gram.cast("binary")), 1, 8), 16, 10).cast("long") % buckets

  /** One row per word-n-gram occurrence: (passthrough cols..., bucket).
    * Tokens are materialized once per row before the shingle window
    * (the [[Dedup.shinglesOf]] rule: inlining split() re-evaluates it
    * per window index).
    */
  private def gramFrame(
      df: DataFrame,
      textCol: String,
      buckets: Int,
      n: Int,
      passthrough: Seq[Column]
  ): DataFrame = {
    val toks = df.withColumn("__toks", split(col(textCol), " "))
    toks
      .select(passthrough :+ explode(Dedup.shinglesOf("__toks", n)).as("__gram"): _*)
      .withColumn("bucket", gramBucket(col("__gram"), buckets))
      .drop("__gram")
  }

  /** Fit the DSIR bucket model in ONE corpus pass: per hashed-n-gram
    * bucket, `ln p̂_target(b) − ln p̂_raw(b)` with add-one smoothing over
    * the `buckets` cells. `isTarget` is a boolean column over `df`
    * marking the target-domain rows (target ⊆ raw, the usual shape:
    * the curated/quality subset of the crawl; an external target corpus
    * unions in with the flag set). Both count vectors come out of the
    * same hash aggregate — the corpus is exploded and scanned once.
    *
    * Returns ≤ `buckets` rows (bucket, log_ratio): broadcast material.
    * Buckets no gram hashed into carry the pure-smoothing ratio via the
    * scorer's `coalesce` (they can only be hit by score-time grams when
    * scoring a DIFFERENT frame than the fit ran on).
    */
  def dsirLogRatios(
      df: DataFrame,
      textCol: String,
      isTarget: Column,
      buckets: Int = 1024,
      n: Int = 2
  ): DataFrame = {
    val grams = gramFrame(df, textCol, buckets, n, Seq(isTarget.as("__is_target")))
    val counts = grams
      .groupBy(col("bucket"))
      .agg(
        sum(when(col("__is_target"), 1L).otherwise(0L)).as("__tc"),
        count(lit(1)).as("__rc")
      )
    // grand totals from the bucket-sized aggregate, not a corpus re-scan
    val totals = counts.agg(sum(col("__tc")).as("__tt"), sum(col("__rc")).as("__rt"))
    counts
      .crossJoin(broadcast(totals))
      .select(
        col("bucket"),
        (log((col("__tc") + lit(1.0)) / (col("__tt") + lit(buckets.toDouble))) -
          log((col("__rc") + lit(1.0)) / (col("__rt") + lit(buckets.toDouble))))
          .as("log_ratio")
      )
  }

  /** Per-document DSIR importance weight: the sum over the document's
    * hashed-n-gram OCCURRENCES of the bucket log-ratio — i.e.
    * `ln p̂_target(doc) − ln p̂_raw(doc)` under the bag-of-hashed-n-grams
    * model. One corpus pass: explode → broadcast-join the ≤`buckets`-row
    * ratio table → per-doc hash aggregate. Rounded to 6 dp so the
    * summation order never leaks into comparisons (the
    * q_unigram_logprob convention).
    *
    * At 100 TB: fit + score is two corpus scans (the gram explode runs
    * in each); a pipeline that already materializes a gram/bucket frame
    * (e.g. alongside minhash shingles) can pass it straight to both.
    */
  def dsirWeights(
      df: DataFrame,
      idCol: String,
      textCol: String,
      ratios: DataFrame,
      buckets: Int = 1024,
      n: Int = 2
  ): DataFrame = {
    val grams = gramFrame(df, textCol, buckets, n, Seq(col(idCol)))
    grams
      .join(broadcast(ratios), "bucket")
      .groupBy(col(idCol))
      .agg(
        count(lit(1)).cast("int").as("n_grams"),
        round(sum(col("log_ratio")), 6).as("dsir_weight")
      )
  }

  /** [[dsirLogRatios]] + [[dsirWeights]] in one call, fit and scored on
    * the same frame.
    */
  def dsirScore(
      df: DataFrame,
      idCol: String,
      textCol: String,
      isTarget: Column,
      buckets: Int = 1024,
      n: Int = 2
  ): DataFrame =
    dsirWeights(df, idCol, textCol, dsirLogRatios(df, textCol, isTarget, buckets, n), buckets, n)

  /** Uniform (0,1) deterministic per-row noise: md5 over seed+id, first
    * 8 hex digits, +0.5 so the value is never exactly 0 or 1 (both ends
    * would blow up the Gumbel transform). The finer-grained sibling of
    * [[Curation.sampleByHash]]'s percent buckets.
    */
  def hashUniform(idCol: Column, seed: String): Column =
    (conv(substring(md5(concat(lit(seed + "-"), idCol.cast("string")).cast("binary")), 1, 8), 16, 10)
      .cast("double") + lit(0.5)) / lit(4294967296.0)

  /** Gumbel-top-k resampling: select k rows with probability
    * ∝ exp(weight / temperature) via the Gumbel-max trick —
    * key = w/T − ln(−ln(u)) with u the deterministic [[hashUniform]]
    * noise, take the k largest keys. One global top-k
    * (TakeOrderedAndProject: per-partition heaps, k rows to the
    * driver), no full sort, no shuffle of the losers. The key is
    * rounded to 6 dp BEFORE ranking with the id as tie-break, so the
    * selected set is identical across engines and runs (the
    * rank-gate rounding rule, BASELINE.md round 14).
    *
    * This is DSIR's resampling step; it equally serves any
    * score-proportional subset draw (quality-weighted sampling,
    * curriculum draws).
    */
  def gumbelTopK(
      weighted: DataFrame,
      idCol: String,
      weightCol: String,
      k: Int,
      temperature: Double = 1.0,
      seed: String = "s42"
  ): DataFrame = {
    require(k >= 1, s"k must be >= 1, got $k")
    require(temperature > 0.0, s"temperature must be > 0, got $temperature")
    weighted
      .withColumn(
        "sel_key",
        round(
          col(weightCol) / lit(temperature) - log(-log(hashUniform(col(idCol), seed))),
          6
        )
      )
      .orderBy(col("sel_key").desc, col(idCol))
      .limit(k)
  }

  /** Per-domain temperature sampling rates: rate_d =
    * (n_d/N)^alpha normalized so the largest domain keeps rate 1 —
    * alpha < 1 flattens the mixture toward the small domains (mT5 uses
    * alpha = 0.3 over languages), alpha = 1 is the natural mixture.
    * Output is one row per domain (domain, n_docs, rate): broadcast
    * material, rounded to 6 dp so the keep/drop threshold is
    * engine-exact.
    */
  def temperatureRates(df: DataFrame, domainCol: String, alpha: Double): DataFrame = {
    require(alpha > 0.0 && alpha <= 1.0, s"alpha in (0,1], got $alpha")
    val counts = df.groupBy(col(domainCol)).agg(count(lit(1)).as("n_docs"))
    val p = col("n_docs").cast("double") / col("__nt").cast("double")
    // grand total AND the max share^alpha both come from the tiny
    // domain-sized aggregate (one row each, crossJoined back) — a
    // window here would be partition-less, which the plan guard forbids
    val withPa = counts
      .crossJoin(broadcast(counts.agg(sum(col("n_docs")).as("__nt"))))
      .withColumn("__pa", pow(p, lit(alpha)))
    withPa
      .crossJoin(broadcast(withPa.agg(max(col("__pa")).as("__pamax"))))
      .withColumn("rate", round(col("__pa") / col("__pamax"), 6))
      .drop("__nt", "__pa", "__pamax")
  }

  /** Apply [[temperatureRates]]: keep each row iff its deterministic
    * [[hashUniform]] draw falls under its domain's rate. The rate table
    * is domain-sized and broadcasts; the corpus never shuffles. The
    * largest domain passes through whole (rate 1), smaller domains are
    * UPsampled relative to their natural share — without duplication
    * (temperature sampling reweights; epoch repetition of small domains
    * is [[Curation.mixCorpus]]'s job).
    */
  def temperatureSample(
      df: DataFrame,
      idCol: String,
      domainCol: String,
      alpha: Double,
      seed: String = "mix7"
  ): DataFrame = {
    val rates = temperatureRates(df, domainCol, alpha).select(col(domainCol), col("rate"))
    df.join(broadcast(rates), domainCol)
      .filter(hashUniform(col(idCol), seed) < col("rate"))
  }
}
