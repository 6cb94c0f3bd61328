package graft.streaming

import graft.operators.History
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.StreamingQuery
import org.apache.spark.sql.{DataFrame, SparkSession}

/** Continuously-maintained SCD type-2 history — the streaming face of
  * [[History.scd2]]: an arriving changelog keeps a persisted,
  * ever-growing versioned-history store current, the same
  * foreachBatch-against-persisted-state loop as [[IncrementalDedup]].
  *
  * Store model: an APPEND-ONLY log of collapsed CHANGE rows (key,
  * attrs, ts, tie, batch stamp). Nothing is ever rewritten in place —
  * closing an interval is a READ-time derivation (`lead` over the
  * per-key change rows, [[view]]), so each micro-batch costs one
  * bounded append instead of a table rewrite. The store holds one row
  * per VERSION (≤ one per change), not per event — the view's window
  * runs over the (much smaller) change log.
  *
  * Per micro-batch plan shape:
  *   1. collapse the batch's events per key ([[History.collapsedChanges]]
  *      — batch-bounded window);
  *   2. fetch each affected key's OPEN attributes from the store: a
  *      broadcast left-semi prune to the batch's keys, then a
  *      hash-aggregable latest-per-key ([[graft.functions.MinByObject]]
  *      — built-in max_by on a struct carry falls to SortAggregate);
  *   3. drop the batch's LEADING rows whose attributes null-safely
  *      equal the open version (the cross-batch collapse — without it
  *      every batch boundary would fabricate a version);
  *   4. append the surviving change rows, stamped with the batch id.
  *
  * Exactly-once: foreachBatch replays a batch after failure; appends
  * are job-atomic (files commit at job end), so replay idempotence is
  * skip-if-present on the `ingest_batch` stamp, and the open-version
  * read EXCLUDES the batch's own stamp so a replay recomputes against
  * exactly the pre-batch state (the [[IncrementalDedup]] discipline).
  *
  * Ordering contract: per-key event time must be non-decreasing ACROSS
  * batches (the changelog-consumer guarantee — Kafka gives it per
  * partition key). A late row older than its key's open version would
  * need retraction/rewrite, which an append-only store cannot express;
  * enforce upstream with a watermark + sort, or fall back to a
  * periodic [[History.scd2]] rebuild.
  */
object IncrementalScd2 {

  private[graft] val BatchCol = "ingest_batch"

  /** Initialize the store from a (possibly empty) changelog batch. */
  def seed(
      events: DataFrame,
      storeDir: String,
      keyCols: Seq[String],
      tsCol: String,
      attrCols: Seq[String],
      tieBreak: Seq[String]
  ): Unit =
    History
      .collapsedChanges(
        events.select((keyCols ++ attrCols ++ (tsCol +: tieBreak)).map(col): _*),
        keyCols, tsCol, attrCols, tieBreak)
      .withColumn(BatchCol, lit(-1L))
      .write.mode("overwrite").parquet(storeDir)

  /** Fold one micro-batch of changelog rows into the store. */
  def ingestBatch(
      spark: SparkSession,
      batch: DataFrame,
      storeDir: String,
      keyCols: Seq[String],
      tsCol: String,
      attrCols: Seq[String],
      tieBreak: Seq[String],
      batchId: Option[Long]
  ): Unit = {
    val store = spark.read.parquet(storeDir)
    if (batchId.exists(b => !store.filter(col(BatchCol) === b).isEmpty))
      return // replayed batch: append already committed, recompute is a no-op
    val prior = batchId.fold(store)(b => store.filter(col(BatchCol) =!= b))

    val cols = (keyCols ++ attrCols ++ (tsCol +: tieBreak)).map(col)
    val withinBatch =
      History.collapsedChanges(batch.select(cols: _*), keyCols, tsCol, attrCols, tieBreak)

    // open version per affected key: semi-prune the store to the
    // batch's keys, latest change row wins (ts, tie ordering)
    val batchKeys = batch.select(keyCols.map(col): _*).distinct()
    val attrs = struct(attrCols.map(col): _*)
    val open = prior
      .join(broadcast(batchKeys), keyCols, "left_semi")
      .groupBy(keyCols.map(col): _*)
      .agg(graft.functions.MinByObject
        .maxBy(attrs, struct((tsCol +: tieBreak).map(col): _*))
        .as("__open"))

    // cross-batch collapse: within the batch, lag() supplies the
    // previous attrs; for each key's FIRST batch row, the store's open
    // version does. A key new to the store keeps its first row
    // (struct <=> null is false).
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(keyCols.map(col): _*)
      .orderBy((tsCol +: tieBreak).map(col): _*)
    val changes = withinBatch
      .join(broadcast(open), keyCols, "left")
      .withColumn("__prev", coalesce(lag(attrs, 1).over(w), col("__open")))
      .filter(!(attrs <=> col("__prev")))
      .select(cols: _*)

    changes
      .withColumn(BatchCol, lit(batchId.getOrElse(-1L)))
      .write.mode("append").parquet(storeDir)
  }

  /** The full SCD2 view over the store: validity intervals, versions
    * and `is_current` derived from the persisted change rows (already
    * collapsed, so this is interval math only — one keyed exchange).
    */
  def view(
      spark: SparkSession,
      storeDir: String,
      keyCols: Seq[String],
      tsCol: String,
      attrCols: Seq[String],
      tieBreak: Seq[String]
  ): DataFrame =
    History.scd2(
      spark.read.parquet(storeDir).drop(BatchCol),
      keyCols, tsCol, attrCols, tieBreak, collapseUnchanged = false)

  /** Drive the loop from a stream: one [[ingestBatch]] per micro-batch.
    *
    * @param compactEvery every N batches, fold the store's accreted
    *   per-batch files back to ~`targetBytes` files
    *   ([[graft.sources.Lake.compact]]) — without it a long-running
    *   loop accumulates one file set per micro-batch and the store
    *   read in step 2 becomes footer-bound. The `ingest_batch` stamp
    *   is a data COLUMN, so replay idempotence survives the rewrite;
    *   compaction only needs the store quiescent, which foreachBatch
    *   guarantees (batches of one query never overlap).
    */
  def attach(
      arriving: DataFrame,
      storeDir: String,
      keyCols: Seq[String],
      tsCol: String,
      attrCols: Seq[String],
      tieBreak: Seq[String],
      checkpointLocation: Option[String] = None,
      compactEvery: Option[Int] = None,
      compactTargetBytes: Long = 128L * 1024 * 1024
  ): StreamingQuery = {
    require(compactEvery.forall(_ > 0), "compactEvery must be positive")
    val spark = arriving.sparkSession
    val writer = arriving.writeStream
      .outputMode("append")
      .foreachBatch { (batch: DataFrame, bid: Long) =>
        ingestBatch(spark, batch, storeDir, keyCols, tsCol, attrCols, tieBreak,
          batchId = Some(bid))
        compactEvery.foreach { n =>
          if (bid > 0 && bid % n == 0)
            graft.sources.Lake.compact(spark, storeDir, compactTargetBytes)
        }
      }
    checkpointLocation
      .fold(writer)(c => writer.option("checkpointLocation", c))
      .start()
  }
}
