package graft

import graft.queries.PipelineQueries
import org.apache.spark.sql.execution.FileSourceScanExec
import org.apache.spark.sql.functions._

/** Scan-boundedness guard for model-extraction samples (the
  * sample-FIRST rule, BASELINE.md round 8): every Lloyd's-training
  * input is built by `PipelineQueries.trainedVecSample` /
  * `trainedResidualSample`, and this spec pins — on a corpus 5× the
  * sample cap, written with small row groups so the assertion has
  * teeth — that executing the extraction plan (`select(vec).limit(cap)`,
  * what `lloydCodebooks`/`lloydCentroids` run) reads ~cap rows from the
  * parquet scan, not the corpus. An orderBy+limit sample (full sort
  * before the limit) or a wide transform upstream of the bounded-id
  * filter would read all rows and fail here.
  */
class ModelSampleGuardSpec extends SparkSpec {

  import spark.implicits._

  private val cap = 4096
  private val corpusRows = 20000L
  // one row ≈ 70 B; a 64 KiB row group holds ~900 rows, so the 20k-row
  // table spans ~20+ row groups and group-granularity slack stays ≪ corpus
  private lazy val embDir: String = {
    val dir = java.nio.file.Files.createTempDirectory("graft_msg_emb").toString
    spark.range(0, corpusRows)
      .select(col("id").as("vec_id"),
        expr("transform(sequence(0, 15), i -> cast((id * (i + 3)) % 97 as float))")
          .as("embedding"))
      .repartitionByRange(4, col("vec_id")).sortWithinPartitions("vec_id")
      .write.mode("overwrite").option("parquet.block.size", 64 * 1024).parquet(dir)
    dir
  }

  /** Execute df and return total rows the parquet scans produced. */
  private def scanRows(df: org.apache.spark.sql.DataFrame): Long = {
    spark.conf.set("spark.sql.adaptive.enabled", "false")
    try {
      df.collect()
      df.queryExecution.executedPlan.collectLeaves().collect {
        case f: FileSourceScanExec => f.metrics("numOutputRows").value
      }.sum
    } finally spark.conf.set("spark.sql.adaptive.enabled", "true")
  }

  test("trainedVecSample extraction reads ~cap rows from the scan, not the corpus") {
    val emb = spark.read.parquet(embDir)
    val extraction = PipelineQueries.trainedVecSample(emb, cap)
      .select(col("embedding")).limit(cap)
    val rows = scanRows(extraction)
    // ≤ cap + one row-group of slack (pushdown skips at group granularity)
    assert(rows <= cap + 2000, s"sample extraction scanned $rows of $corpusRows rows")
    assert(rows >= cap, s"sample must still see all $cap training rows, got $rows")
    // and the bound comes from pushdown, not luck: the filter reaches the scan
    val plan = extraction.queryExecution.executedPlan.toString
    assert(plan.contains(s"LessThan(vec_id,$cap)"), "bounded-id filter must be pushed")
  }

  test("trainedResidualSample (IVF-PQ) samples FIRST — residuals never see the corpus") {
    val emb = spark.read.parquet(embDir)
    val centroids = (0 until 8)
      .map(i => (i, Array.tabulate(16)(j => ((i * 7 + j) % 5).toFloat).toSeq))
      .toDF("centroid_id", "centroid_vec")
    val extraction = PipelineQueries.trainedResidualSample(emb, centroids, cap)
      .select(col("res")).limit(cap)
    val rows = scanRows(extraction)
    assert(rows <= cap + 2000, s"residual sample scanned $rows of $corpusRows rows")
    assert(rows >= cap, s"residual sample must still see all $cap training rows, got $rows")
  }

  test("no unbounded driver materialization in src/main: every .collect() site is allowlisted") {
    // The companion rule to the scan-boundedness pins above: a
    // `.collect()` in an operator path means the operator isn't
    // distributed (or OOMs the driver) at 100×. Every call site must be
    // bounded — by a limit/cap, a one-row aggregate, a dimension table,
    // or a sampleCap'd model extraction — and registered here WITH its
    // bound. A new .collect() anywhere else fails this sweep: either
    // bound it (toLocalIterator / limit / cap) or consciously extend
    // the allowlist with the reason.
    val allowed = Map(
      // latest(n): orderBy.limit(n) — bounded by the caller's n
      "GraftContext.scala" -> 1,
      // idPushdownCap-bounded candidate-id pulls (cap + 1 probes the overflow)
      "streaming/StreamingCuration.scala" -> 1,
      "streaming/IncrementalDedup.scala" -> 1,
      // market-calendar dimension table (days × markets, not data volume)
      "streaming/MarketSchedule.scala" -> 1,
      // vocabCap-bounded model pulls: BPE merge-table extraction plus the
      // round-14 trainUnigram / unigramLogLikelihood word-count pulls —
      // all three are limit(vocabCap).collect() bounded-model extractions
      "operators/Tokenizer.scala" -> 3,
      // sampleCap'd Lloyd's-training model extractions (the tests above)
      "operators/Similarity.scala" -> 3,
      // buckets-bounded gradient pull: the logistic-regression fit
      // collects ≤ buckets + 1 (bucket, gradient) rows per epoch —
      // the model is driver-sized by construction, never the corpus
      "operators/Classifier.scala" -> 1,
      // buckets-bounded DSIR ratio-table pull feeding the literal-array
      // scoring fold (the tokenizer-codebook discipline)
      "operators/Selection.scala" -> 1,
      // measurement mirrors: one-row aggregates (count/sum) and
      // per-batch key sets bounded by the batch, all feeding printed
      // evidence tables, not operator plans
      "examples/AnnIngestionScale.scala" -> 2,
      // nShards-bounded manifest pulls (pre-write + read-back verify)
      "examples/ShardWriteScale.scala" -> 2,
      "examples/Scd2IngestionScale.scala" -> 3,
      "examples/RuntimeEvents.scala" -> 1,
      "examples/HoppingPull.scala" -> 1,
      "examples/IncrementalIngestion.scala" -> 1,
      "examples/IngestionScale.scala" -> 4,
      // manifest-verification pulls in the crawl→shards pipeline stage:
      // each is ≤ #shards rows (1024 manifest lines), never the corpus
      "examples/ProductionPipeline.scala" -> 3,
      // limit(pairs·2·17)-bounded batch material for the paired probe
      // A/B — a measurement harness input, never an operator plan
      "examples/ProbeTailAB.scala" -> 1,
      // A/B equality-proof dumper: toJSON.collect() of named BENCH
      // query outputs (top-k / per-radius / per-group frames, all
      // driver-sized by the queries' own bounds), written to files for
      // diffing — a measurement harness, never an operator plan (r20)
      "examples/DumpBench.scala" -> 1
    )
    val root = java.nio.file.Paths.get("src/main/scala/graft")
    val offenders = scala.collection.mutable.ListBuffer.empty[String]
    java.nio.file.Files.walk(root).forEach { p =>
      if (p.toString.endsWith(".scala")) {
        val rel = root.relativize(p).toString
        val n = "\\.collect\\(\\)|collectAsList".r
          .findAllIn(java.nio.file.Files.readString(p)).size
        if (n > allowed.getOrElse(rel, 0))
          offenders += s"$rel has $n .collect() sites (allowlisted: ${allowed.getOrElse(rel, 0)})"
      }
    }
    assert(offenders.isEmpty, offenders.mkString("\n"))
  }

  test("the counter-example: an orderBy+limit sample DOES read the corpus") {
    // documents the hazard the helpers exist to avoid — if this ever
    // starts passing the ≤-cap bound, the guard above lost its teeth
    val emb = spark.read.parquet(embDir)
    val bad = emb.orderBy("vec_id").select(col("embedding")).limit(cap)
    assert(scanRows(bad) == corpusRows, "full sort must read everything")
  }
}
