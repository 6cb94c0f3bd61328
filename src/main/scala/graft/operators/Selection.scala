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
    gramBucket(gram, buckets, HashFamily.Md5)

  /** [[gramBucket]] with the family dial: [[HashFamily.Md5]] is the
    * oracle form (DuckDB recomputes it digit-for-digit);
    * [[HashFamily.XxHash64]] is the production form — one codegen'd
    * 64-bit mix, no hex round-trip (the [[Dedup]] family's measured
    * ~25% minhash saving is mostly THIS swap; here the md5 chain is
    * the dominant per-gram cost, so the saving is larger — see
    * BASELINE.md round 15). Bucket assignments differ between
    * families, so fitted ratios/weights are family-consistent only —
    * never mix families between fit and score.
    */
  def gramBucket(gram: Column, buckets: Int, family: HashFamily): Column = family match {
    case HashFamily.Md5 =>
      conv(substring(md5(gram.cast("binary")), 1, 8), 16, 10).cast("long") % buckets
    case HashFamily.XxHash64 =>
      pmod(xxhash64(gram), lit(buckets.toLong))
  }

  /** One row per word-n-gram occurrence: (passthrough cols..., bucket).
    * Tokens are materialized once per row before the shingle window
    * (the [[Dedup.shinglesOf]] rule: inlining split() re-evaluates it
    * per window index).
    */
  /** Number of [[Dedup.shinglesOf]] n-grams a document contributes:
    * max(words − n + 1, 1) — pure token arithmetic, so gram TOTALS
    * never pay the hash/explode pass.
    */
  private def gramCount(textCol: String, n: Int): Column =
    greatest(size(split(col(textCol), " ")) - lit(n - 1), lit(1)).cast("long")

  /** Fit the DSIR bucket model in ONE corpus pass: per hashed-n-gram
    * bucket, `ln p̂_target(b) − ln p̂_raw(b)` with add-one smoothing over
    * the `buckets` cells. `isTarget` is a boolean column over `df`
    * marking the target-domain rows (target ⊆ raw, the usual shape:
    * the curated/quality subset of the crawl; an external target corpus
    * unions in with the flag set).
    *
    * The pass is one [[graft.functions.GramBucketCounts]] typed
    * aggregate: each partition contributes a single 2·buckets count
    * buffer, the exchange carries KBs at any corpus size, and both
    * count vectors AND their grand totals come out of the one result
    * row (the first cut exploded one row per gram occurrence through a
    * hash aggregate — 27M exchange rows at sf1, measured ~4× slower).
    *
    * Returns exactly `buckets` rows (bucket, log_ratio) — broadcast
    * material; buckets no gram hashed into carry the pure-smoothing
    * zero-count ratio, so scoring a frame OTHER than the fit frame
    * needs no default handling.
    */
  def dsirLogRatios(
      df: DataFrame,
      textCol: String,
      isTarget: Column,
      buckets: Int = 1024,
      n: Int = 2,
      family: HashFamily = HashFamily.Md5
  ): DataFrame =
    ratiosFromCountsRow(
      df.agg(gramCountsAgg(col(textCol), isTarget, buckets, n, family).as("__v")),
      buckets)

  /** The [[graft.functions.GramBucketCounts]] typed aggregate as a
    * Column: one 2·buckets long buffer per partition on the exchange
    * (raw counts in cells [0, buckets), target counts in
    * [buckets, 2·buckets)). Shared by the batch fit above and the
    * [[graft.streaming.IncrementalSelection]] per-batch ingest — the
    * store identity rests on both sides counting with the SAME kernel.
    */
  private[graft] def gramCountsAgg(
      textCol: Column,
      isTarget: Column,
      buckets: Int,
      n: Int,
      family: HashFamily
  ): Column =
    org.apache.spark.sql.graftbridge.ColumnBridge.column(
      graft.functions
        .GramBucketCounts(
          org.apache.spark.sql.graftbridge.ColumnBridge.expression(textCol),
          org.apache.spark.sql.graftbridge.ColumnBridge.expression(isTarget),
          n,
          buckets,
          family == HashFamily.XxHash64
        )
        .toAggregateExpression()
    )

  /** Count vector → smoothed log-ratio table: `countsRow` is ONE row
    * with column `__v` (the 2·buckets [[gramCountsAgg]] layout); both
    * grand totals derive from the vector itself, so an incrementally
    * summed vector yields ratios IDENTICAL to a from-scratch fit —
    * integer count addition is exact (the incremental store's identity
    * contract, StreamingSelectionSpec).
    */
  private[graft] def ratiosFromCountsRow(countsRow: DataFrame, buckets: Int): DataFrame = {
    val bD = lit(buckets.toDouble)
    countsRow
      .select(
        col("__v"),
        aggregate(slice(col("__v"), 1, buckets), lit(0L), _ + _).as("__rt"),
        aggregate(slice(col("__v"), buckets + 1, buckets), lit(0L), _ + _).as("__tt")
      )
      .select(col("__tt"), col("__rt"), col("__v"), posexplode(slice(col("__v"), 1, buckets)))
      .select(
        col("pos").cast("long").as("bucket"),
        (log((element_at(col("__v"), col("pos") + lit(buckets + 1)) + lit(1.0)) / (col("__tt") + bD)) -
          log((col("col") + lit(1.0)) / (col("__rt") + bD))).as("log_ratio")
      )
  }

  /** Per-document DSIR importance weight: the sum over the document's
    * hashed-n-gram OCCURRENCES of the bucket log-ratio — i.e.
    * `ln p̂_target(doc) − ln p̂_raw(doc)` under the bag-of-hashed-n-grams
    * model. Rounded to 6 dp so the summation order never leaks into
    * comparisons (the q_unigram_logprob convention).
    *
    * Scale shape: the ≤`buckets`-row ratio table is pulled to the
    * driver ONCE (bucket-bounded by construction — the
    * tokenizer-codebook discipline) and rides into the plan as a
    * literal array; the weight is then a per-row fold over the
    * document's own shingle array — ZERO shuffle, scan-linear at any
    * corpus size. The first cut of this operator broadcast-JOINED the
    * ratio table onto the exploded gram stream and re-aggregated by
    * doc: same values, but it shuffled one row per gram occurrence
    * (27M rows at sf1 — measured ~2× slower; BASELINE.md round 15).
    *
    * `defaultRatio` fills buckets absent from `ratios` — never needed
    * for a [[dsirLogRatios]] table (it emits every bucket, zero-count
    * cells carrying the smoothing ratio); it exists for truncated or
    * externally-persisted ratio tables.
    */
  def dsirWeights(
      df: DataFrame,
      idCol: String,
      textCol: String,
      ratios: DataFrame,
      buckets: Int = 1024,
      n: Int = 2,
      family: HashFamily = HashFamily.Md5,
      defaultRatio: Double = 0.0
  ): DataFrame = {
    val byBucket = ratios
      .select(col("bucket").cast("long"), col("log_ratio").cast("double"))
      .collect() // bounded: the ratio table is ≤ buckets rows by construction
      .map(r => r.getLong(0) -> r.getDouble(1))
      .toMap
    val ratioArr = Array.tabulate(buckets)(b => byBucket.getOrElse(b.toLong, defaultRatio))
    df.select(
      col(idCol),
      gramCount(textCol, n).cast("int").as("n_grams"),
      round(hashedGramFold(col(textCol), n, buckets, ratioArr, family), 6).as("dsir_weight")
    )
  }

  /** The native scoring kernel: Σ gram occurrences of table(bucket).
    * One fused split+window+hash loop per row (no shingle array, no
    * interpreted lambda chain) — value-identical to
    * [[hashedGramFoldComposed]], spec-pinned.
    */
  def hashedGramFold(
      textCol: Column,
      n: Int,
      buckets: Int,
      table: Array[Double],
      family: HashFamily
  ): Column =
    org.apache.spark.sql.graftbridge.ColumnBridge.column(
      graft.functions.HashedGramFold(
        org.apache.spark.sql.graftbridge.ColumnBridge.expression(textCol),
        n,
        buckets,
        table.toIndexedSeq,
        family == HashFamily.XxHash64
      )
    )

  /** The composed twin of [[hashedGramFold]] — the identity oracle for
    * its spec pin (and the plain-Spark reading of the semantics).
    */
  private[graft] def hashedGramFoldComposed(
      textCol: Column,
      n: Int,
      buckets: Int,
      table: Array[Double],
      family: HashFamily
  ): Column = {
    val tLit = typedLit(table.toSeq)
    val toksArr = split(textCol, " ")
    // spec-only: the inlined split re-evaluates per window index
    // (O(words²)) — the exact cost class the native form exists to avoid
    val shingles = transform(
      sequence(lit(0), greatest(size(toksArr) - lit(n), lit(0))),
      i => concat_ws(" ", slice(toksArr, i + lit(1), lit(n)))
    )
    aggregate(
      shingles,
      lit(0.0),
      (acc, g) => acc + element_at(tLit, (gramBucket(g, buckets, family) + lit(1L)).cast("int"))
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
      n: Int = 2,
      family: HashFamily = HashFamily.Md5
  ): DataFrame =
    dsirWeights(
      df, idCol, textCol,
      dsirLogRatios(df, textCol, isTarget, buckets, n, family),
      buckets, n, family)

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

  /** The keep-a-FRACTION face of [[gumbelTopK]]: retain ~`frac` of the
    * rows, selection probability ∝ exp(weight/temperature), by
    * thresholding the same deterministic Gumbel keys at their
    * (1 − frac) approximate quantile instead of ranking. Top-k is the
    * wrong op when k is corpus-proportional (a global limit funnels k
    * rows through one partition); this form is a bounded
    * `percentile_approx` sketch + a broadcast 1-row cutoff + a
    * scan-local filter — zero corpus shuffle at any scale. The cutoff
    * is approximate, so the kept fraction is ~frac (sketch accuracy),
    * but WHICH rows survive at a given cutoff is exact and
    * reproducible (the keys are deterministic).
    */
  def gumbelTopFrac(
      weighted: DataFrame,
      idCol: String,
      weightCol: String,
      frac: Double,
      temperature: Double = 1.0,
      seed: String = "s42"
  ): DataFrame = {
    require(frac > 0.0 && frac <= 1.0, s"frac in (0,1], got $frac")
    require(temperature > 0.0, s"temperature must be > 0, got $temperature")
    val keyed = weighted.withColumn(
      "sel_key",
      col(weightCol) / lit(temperature) - log(-log(hashUniform(col(idCol), seed)))
    )
    val cutoff = keyed.agg(
      percentile_approx(col("sel_key"), lit(1.0 - frac), lit(10000)).as("__cut"))
    keyed
      .crossJoin(broadcast(cutoff))
      .filter(col("sel_key") >= col("__cut"))
      .drop("__cut", "sel_key")
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
