package graft

import graft.core.ErrorAction
import graft.streaming.ErrorSink
import org.apache.spark.sql.DataFrame

import java.nio.file.Files
import java.util.concurrent.atomic.AtomicInteger

/** DLQ / error-policy behavior (Skip / Retry / Dlq per entity). */
class ErrorSinkSpec extends SparkSpec {
  import spark.implicits._

  private def batch: DataFrame = Seq((1, "a"), (2, "b")).toDF("id", "v")

  test("Retry re-attempts and succeeds without DLQ rows") {
    val dlq = Files.createTempDirectory("dlq").toString + "/out"
    val attempts = new AtomicInteger(0)
    val fn = ErrorSink.guardedForeachBatch(
      spark, "src", ErrorAction.Retry, dlq, maxRetries = 3, initialDelayMs = 1) { _ =>
      if (attempts.incrementAndGet() < 3) sys.error("transient")
    }
    fn(batch, 0L)
    assert(attempts.get() == 3)
    assert(!new java.io.File(dlq).exists()) // nothing dead-lettered
  }

  test("Dlq writes envelope rows on failure") {
    val dlq = Files.createTempDirectory("dlq").toString + "/out"
    val fn = ErrorSink.guardedForeachBatch(
      spark, "src", ErrorAction.Dlq, dlq) { _ => sys.error("boom") }
    fn(batch, 0L)
    val rows = spark.read.parquet(dlq).collect()
    assert(rows.length == 2)
    assert(rows.forall(_.getAs[String]("source") == "src"))
    assert(rows.forall(_.getAs[String]("raw").contains("\"id\"")))
  }

  test("retryWhen predicate stops retries for non-matching errors (WithRetryWhen)") {
    val dlq = Files.createTempDirectory("dlq").toString + "/out"
    val attempts = new AtomicInteger(0)
    val fn = ErrorSink.guardedForeachBatch(
      spark, "src", ErrorAction.Retry, dlq, maxRetries = 5, initialDelayMs = 1,
      retryWhen = _.getMessage.contains("transient")) { _ =>
      attempts.incrementAndGet()
      sys.error("fatal: not retryable")
    }
    fn(batch, 0L)
    assert(attempts.get() == 1) // no retries on a non-matching error
    assert(spark.read.parquet(dlq).count() == 2) // dead-lettered instead
  }

  test("Skip drops the failed batch silently") {
    val dlq = Files.createTempDirectory("dlq").toString + "/out"
    val fn = ErrorSink.guardedForeachBatch(
      spark, "src", ErrorAction.Skip, dlq) { _ => sys.error("boom") }
    fn(batch, 0L)
    assert(!new java.io.File(dlq).exists())
  }

  test("splitCorrupt routes corrupt records to DLQ envelopes") {
    val raw = Seq(
      ("""{"id": 1}""", null),
      (null, """{bad json""")
    ).toDF("id_json", ErrorSink.CorruptCol)
    val (good, bad) = ErrorSink.splitCorrupt(raw, "ingest")
    assert(good.count() == 1)
    val badRows = bad.collect()
    assert(badRows.length == 1)
    assert(badRows.head.getAs[String]("error_phase") == "deserialization")
  }
}
