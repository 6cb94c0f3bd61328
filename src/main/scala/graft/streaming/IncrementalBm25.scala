package graft.streaming

import graft.operators.TextAnalysis
import graft.operators.TextAnalysis.Bm25Index
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.StreamingQuery
import org.apache.spark.sql.{DataFrame, SparkSession}

/** Incrementally-maintained BM25 index: each arriving micro-batch
  * appends its documents' term-frequency rows to ONE persisted store;
  * document frequencies and corpus stats are DERIVED from that store at
  * load time, so there is no second table to keep transactionally in
  * step — the maintainer inherits exactly-once from a single
  * batch-stamped append (the [[IncrementalSketches]] shape, applied to
  * retrieval).
  *
  * Contract (spec-pinned): `bm25Serve(load(store))` returns the SAME
  * ranking as a from-scratch [[TextAnalysis.bm25Index]] over the
  * accumulated corpus — tf/df/N are exact counts either way, and the
  * df/stats derivation is one O(|tf|) aggregate over the store, never a
  * corpus re-tokenization. Per-batch cost: tokenize THE BATCH, one hash
  * agg, one append. Append-only (deletions rebuild, like the dedup
  * corpus stores).
  */
object IncrementalBm25 {

  private[graft] val BatchCol = "ingest_batch"

  private def tfOf(docs: DataFrame, idCol: String, textCol: String): DataFrame =
    docs
      .select(col(idCol), split(col(textCol), " ").as("__toks"))
      .withColumn("dl", size(col("__toks")).cast("double"))
      .select(col(idCol), col("dl"), explode(col("__toks")).as("term"))
      .groupBy(col(idCol), col("term"))
      .agg(count(lit(1)).as("tf"), max(col("dl")).as("dl"))

  /** Write the initial tf store (`ingest_batch = -1`). */
  def seed(
      corpus: DataFrame,
      storeDir: String,
      idCol: String = "doc_id",
      textCol: String = "text"
  ): Unit =
    tfOf(corpus, idCol, textCol)
      .withColumn(BatchCol, lit(-1L))
      .write.mode("overwrite").parquet(storeDir)

  /** Append one micro-batch's tf rows; replay-idempotent with
    * `batchId` set. `probeReplay = false` skips the store probe — only
    * safe when the caller KNOWS the id is fresh
    * ([[StoreGuard.ReplayProbe]]). Returns false iff the batch was a
    * replay no-op.
    */
  def ingestBatch(
      spark: SparkSession,
      batch: DataFrame,
      storeDir: String,
      idCol: String = "doc_id",
      textCol: String = "text",
      batchId: Option[Long] = None,
      probeReplay: Boolean = true
  ): Boolean = {
    // heal a compaction the previous run crashed mid-swap BEFORE any
    // read of the store (two existence checks when healthy — see
    // Lake.recoverCompact; same per-trigger discipline as the dedup
    // and SCD2 loops)
    graft.sources.Lake.recoverCompact(storeDir)
    // StoreGuard tolerates a missing/partial store, so `attach` without
    // a prior `seed` bootstraps it on the first micro-batch instead of
    // dying on AnalysisException inside foreachBatch
    batchId match {
      case Some(b) if probeReplay && StoreGuard.hasBatch(spark, storeDir, BatchCol, b) =>
        return false
      case _ => ()
    }
    // Materialize once, size the append fan-out from the known row
    // count (one file per ~50k tf rows — StoreGuard.appendParts; r20,
    // the r19 dedup-loop discipline): the tf agg otherwise inherits
    // shuffle partitioning and appends one near-empty file per shuffle
    // partition per trigger. The count also feeds the loop-health event
    // without a second tokenize pass.
    val tf = tfOf(batch, idCol, textCol)
      .withColumn(BatchCol, lit(batchId.getOrElse(-1L)))
      .persist()
    val nRows = tf.count()
    if (nRows > 0)
      tf.coalesce(StoreGuard.appendParts(spark, nRows))
        .write.mode("append").parquet(storeDir)
    RuntimeEventBus.ingested(storeDir, batchId, nRows)
    tf.unpersist()
    true
  }

  /** Load the store as a servable [[Bm25Index]]: df and corpus stats
    * derive from the tf rows (df = terms' doc counts; N/avgdl from the
    * per-doc lengths, one row per doc via the (id, dl) projection).
    */
  def load(
      spark: SparkSession,
      storeDir: String,
      idCol: String = "doc_id"
  ): Bm25Index = {
    val tf = spark.read.parquet(storeDir).drop(BatchCol)
    val dfreq = tf.groupBy(col("term")).agg(count(lit(1)).as("df"))
    val docs = tf.select(col(idCol), col("dl")).groupBy(col(idCol))
      .agg(max(col("dl")).as("dl"))
    val stats = docs.agg(
      avg(col("dl")).as("avgdl"),
      count(lit(1)).cast("double").as("n"))
    Bm25Index(tf, dfreq, stats, idCol)
  }

  /** Attach the index maintenance loop to a document stream.
    *
    * `compactEvery` folds the per-batch file accretion back every N
    * batches ([[CompactCadence]] — the measured ~500–700-file
    * crossover applies to this store like any other; the tf store is
    * the LARGEST of the incremental stores, one row per (doc, term),
    * so a long-running loop goes footer-bound without it). The repack
    * RANGE-clusters on `term` so a serve-time term probe can skip
    * whole files on min/max stats — the df/stats derivation in
    * [[load]] aggregates everything regardless, but retrieval touches
    * only the query's terms. `asyncCompact` moves the rewrite off the
    * trigger path (the [[IncrementalDedup]] discipline — measured
    * guidance on that attach's scaladoc).
    */
  def attach(
      arriving: DataFrame,
      storeDir: String,
      idCol: String = "doc_id",
      textCol: String = "text",
      checkpointLocation: Option[String] = None,
      compactEvery: Option[Int] = None,
      compactTargetBytes: Long = 128L * 1024 * 1024,
      asyncCompact: Boolean = false
  ): StreamingQuery = {
    val spark = arriving.sparkSession
    val cadence = new CompactCadence(spark, storeDir, compactEvery, asyncCompact,
      compactTargetBytes, rangeCols = Seq("term"))
    val probe = new StoreGuard.ReplayProbe
    val writer = arriving.writeStream
      .outputMode("append")
      .foreachBatch { (batch: DataFrame, bid: Long) =>
        cadence.finishPending(bid)
        if (ingestBatch(spark, batch, storeDir, idCol, textCol, batchId = Some(bid),
            probeReplay = probe.needed))
          probe.ingested()
        cadence.maybeCompact(bid)
      }
    checkpointLocation
      .fold(writer)(c => writer.option("checkpointLocation", c))
      .start()
  }
}
