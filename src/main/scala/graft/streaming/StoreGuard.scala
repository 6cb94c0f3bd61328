package graft.streaming

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions.{col, lit}

/** Replay-idempotence guard shared by the incremental stores
  * (IncrementalBm25 / IncrementalSketches / DriftMonitor /
  * QualityMonitor / StreamingCuration).
  *
  * Deliberately filesystem-AGNOSTIC: a `java.io.File(dir).exists()`
  * probe is local-only — on HDFS/S3 it always answers false, so a
  * replayed foreachBatch would append a duplicate row and break the
  * documented "replayed batch id no-ops" contract. Instead we attempt
  * the read through Spark's own filesystem layer and treat ANY failure
  * (store not created yet, dir present but no parquet footers after a
  * partial write) as "batch not seen" — correct in both cases, because
  * an absent/empty store cannot contain the batch, and it lets the
  * FIRST micro-batch bootstrap a store that `seed` never created.
  */
private[streaming] object StoreGuard {

  /** True iff `dir` is a readable store whose `batchCol` already
    * contains `b`.
    */
  def hasBatch(spark: SparkSession, dir: String, batchCol: String, b: Long): Boolean =
    try {
      val df = spark.read.parquet(dir)
      df.columns.contains(batchCol) && !df.filter(col(batchCol) === lit(b)).isEmpty
    } catch { case scala.util.control.NonFatal(_) => false }
}
