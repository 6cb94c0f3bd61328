package graft.streaming

import org.apache.spark.sql.functions.{col, lit}
import org.apache.spark.sql.{AnalysisException, DataFrame, SparkSession}

/** Replay-idempotence guard shared by the incremental stores
  * (IncrementalBm25 / IncrementalSketches / DriftMonitor /
  * QualityMonitor / StreamingCuration / IncrementalScd2).
  *
  * Deliberately filesystem-AGNOSTIC: a `java.io.File(dir).exists()`
  * probe is local-only — on HDFS/S3 it always answers false, so a
  * replayed foreachBatch would append a duplicate row and break the
  * documented "replayed batch id no-ops" contract. Instead we attempt
  * the read through Spark's own filesystem layer and treat the two
  * ABSENCE conditions (store not created yet → PATH_NOT_FOUND; dir
  * present but no parquet footers after a partial write →
  * UNABLE_TO_INFER_SCHEMA) as "batch not seen" — correct in both
  * cases, because an absent/empty store cannot contain the batch, and
  * it lets the FIRST micro-batch bootstrap a store that `seed` never
  * created. Any OTHER failure (an object-store throttle, a permission
  * blip, a corrupted footer) is RETHROWN: swallowing it into "not
  * seen" would let a replayed batch double-append — exactly the
  * corruption this guard exists to prevent. Better to fail the
  * micro-batch and let the streaming restart policy retry.
  */
private[streaming] object StoreGuard {

  /** The store dir as a DataFrame, or None iff the store genuinely
    * does not exist yet (absent path / no committed parquet files).
    * Transient or structural read errors propagate.
    */
  def readStore(spark: SparkSession, dir: String): Option[DataFrame] =
    try Some(spark.read.parquet(dir))
    catch { case e: AnalysisException if isAbsence(e) => None }

  /** True iff `dir` is a readable store whose `batchCol` already
    * contains `b`.
    */
  def hasBatch(spark: SparkSession, dir: String, batchCol: String, b: Long): Boolean =
    readStore(spark, dir).exists { df =>
      df.columns.contains(batchCol) && !df.filter(col(batchCol) === lit(b)).isEmpty
    }

  private def isAbsence(e: AnalysisException): Boolean = {
    val cond = Option(e.getCondition).getOrElse("")
    cond.startsWith("PATH_NOT_FOUND") ||
    cond.startsWith("UNABLE_TO_INFER_SCHEMA") ||
    // older error-class spellings, belt-and-braces for point releases
    e.getMessage.contains("Path does not exist") ||
    e.getMessage.contains("Unable to infer schema")
  }
}
