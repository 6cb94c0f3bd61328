package graft.streaming

import graft.operators.{HashFamily, Selection}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.StreamingQuery
import org.apache.spark.sql.{Column, DataFrame, SparkSession}

/** Streaming face of the DSIR bucket model ([[graft.operators.Selection]]):
  * each arriving micro-batch collapses to ONE persisted row — its
  * 2·buckets hashed-n-gram count vector — and any later fit question
  * (the log-ratio table, per-doc importance weights for NEW documents)
  * is answered by summing the KB-sized store. The crawl is touched
  * exactly once, at ingest; the model keeps absorbing fresh data
  * without ever re-reading history.
  *
  * This is the [[IncrementalSketches]] cost inversion applied to data
  * selection, and the identity is even stronger than the sketch
  * family's: bucket counts are plain longs, element-wise addition is
  * exact, and [[Selection.ratiosFromCountsRow]] derives both smoothing
  * totals from the vector itself — so the incrementally maintained
  * ratio table is IDENTICAL (double-for-double) to a from-scratch
  * [[Selection.dsirLogRatios]] over everything the store has seen
  * (StreamingSelectionSpec pins this, and that scoring through the
  * maintained store equals [[Selection.dsirScore]] on the full corpus).
  *
  * Scale shape: per-batch work is one [[graft.functions.GramBucketCounts]]
  * typed aggregate over the BATCH (each task ships a single 2·buckets
  * buffer — KBs on the exchange at any batch size); the store grows by
  * one ~16 KB row per batch; a ratio refresh reads |batches|·2·buckets
  * exploded cells — sub-second at thousands of batches. At 100 TB the
  * corpus-sized cost lives where it must (the ingest scan you were
  * already paying), and the model refresh is free.
  *
  * Exactly-once: the [[StoreGuard]] stamp discipline — a replayed
  * `foreachBatch` invocation sees its own batch id in the store and
  * no-ops; counting is deterministic, so a repaired append carries
  * identical content.
  */
object IncrementalSelection {

  private[graft] val BatchCol = "ingest_batch"

  private def countsRow(
      batch: DataFrame,
      textCol: String,
      isTarget: Column,
      buckets: Int,
      n: Int,
      family: HashFamily
  ): DataFrame =
    batch.agg(Selection.gramCountsAgg(col(textCol), isTarget, buckets, n, family).as("counts"))

  /** Write the initial count store from an existing corpus
    * (`ingest_batch = -1`), establishing the stamped schema. `isTarget`
    * marks the target-domain rows (the [[Selection.dsirLogRatios]]
    * convention: target ⊆ raw; an external target corpus unions in
    * with the flag set).
    */
  def seed(
      df: DataFrame,
      storeDir: String,
      textCol: String,
      isTarget: Column,
      buckets: Int = 1024,
      n: Int = 2,
      family: HashFamily = HashFamily.Md5
  ): Unit =
    countsRow(df, textCol, isTarget, buckets, n, family)
      .withColumn(BatchCol, lit(-1L))
      .write.mode("overwrite").parquet(storeDir)

  /** Count one micro-batch and append its single vector row. With
    * `batchId` set, a replay is a no-op.
    */
  def ingestBatch(
      spark: SparkSession,
      batch: DataFrame,
      storeDir: String,
      textCol: String,
      isTarget: Column,
      buckets: Int = 1024,
      n: Int = 2,
      family: HashFamily = HashFamily.Md5,
      batchId: Option[Long] = None
  ): Unit = {
    batchId match {
      // StoreGuard tolerates a missing/partial store: attach-without-seed
      // bootstraps on the first micro-batch (see StoreGuard scaladoc)
      case Some(b) if StoreGuard.hasBatch(spark, storeDir, BatchCol, b) => return
      case _ => ()
    }
    countsRow(batch, textCol, isTarget, buckets, n, family)
      .withColumn(BatchCol, lit(batchId.getOrElse(-1L)))
      .write.mode("append").parquet(storeDir)
  }

  /** The maintained model: element-wise-sum the store's count vectors
    * (posexplode → one hash agg over |batches|·2·buckets tiny rows →
    * re-assemble in bucket order) and derive the smoothed log-ratio
    * table — exactly `buckets` rows, broadcast material, identical to a
    * from-scratch fit of everything ingested.
    */
  def ratios(spark: SparkSession, storeDir: String, buckets: Int = 1024): DataFrame = {
    val merged = spark.read.parquet(storeDir)
      .select(posexplode(col("counts")))
      .groupBy(col("pos")).agg(sum(col("col")).as("c"))
      .agg(collect_list(struct(col("pos"), col("c"))).as("__pc"))
      .select(transform(array_sort(col("__pc")), x => x.getField("c")).as("__v"))
    Selection.ratiosFromCountsRow(merged, buckets)
  }

  /** Score any frame (typically documents the store never saw) under
    * the maintained model — [[Selection.dsirWeights]] with the merged
    * ratio table: the ≤buckets-row model rides in as a literal array,
    * the scored frame never shuffles.
    */
  def score(
      df: DataFrame,
      idCol: String,
      textCol: String,
      storeDir: String,
      buckets: Int = 1024,
      n: Int = 2,
      family: HashFamily = HashFamily.Md5
  ): DataFrame =
    Selection.dsirWeights(
      df, idCol, textCol,
      ratios(df.sparkSession, storeDir, buckets),
      buckets, n, family)

  /** Attach the count-store maintenance loop to a stream. */
  def attach(
      arriving: DataFrame,
      storeDir: String,
      textCol: String,
      isTarget: Column,
      buckets: Int = 1024,
      n: Int = 2,
      family: HashFamily = HashFamily.Md5,
      checkpointLocation: Option[String] = None
  ): StreamingQuery = {
    val spark = arriving.sparkSession
    val writer = arriving.writeStream
      .outputMode("append")
      .foreachBatch { (batch: DataFrame, bid: Long) =>
        ingestBatch(spark, batch, storeDir, textCol, isTarget, buckets, n, family,
          batchId = Some(bid))
      }
    checkpointLocation
      .fold(writer)(c => writer.option("checkpointLocation", c))
      .start()
  }
}
