package graft

import graft.core.ErrorAction
import graft.sources.EmbeddedBroker
import graft.sources.EmbeddedBroker.ProducerRecord
import graft.streaming.ErrorSink
import org.apache.spark.sql.functions._

/** Connectivity-category fault injection — the reference's
  * service-down physical tests re-expressed against the embedded
  * broker (ref physicalTests/Connectivity/README.md: KafkaServiceDown,
  * BigBang Tolerant = operations fail immediately with clear errors,
  * BigBang Strict = operations keep retrying until the budget runs
  * out). "Stopping the service" here is making the broker's storage
  * root unavailable; the assertions are the ones the reference makes —
  * produce throws an indicative error while down, the ErrorAction
  * policy (Skip / Retry / DLQ) governs what a consuming pipeline does
  * with the failure, and the loop resumes once the service is back.
  */
class BrokerFaultSpec extends SparkSpec {
  import spark.implicits._

  private def rec(i: Int) =
    ProducerRecord(s"k$i".getBytes("UTF-8"), s"v$i".getBytes("UTF-8"), 1000L + i)

  /** Rename the broker root away and back — StopServiceAsync /
    * StartServiceAsync without docker.
    */
  private def withServiceDown(root: String)(body: => Unit): Unit = {
    val dir = new java.io.File(root)
    val aside = new java.io.File(root + ".__down")
    require(dir.renameTo(aside), s"cannot take $root down")
    try body
    finally require(aside.renameTo(dir), s"cannot restore $root")
  }

  test("produce fails fast with an indicative error while the broker is down, resumes after restart") {
    val root = java.nio.file.Files.createTempDirectory("graft_fault").toString + "/broker"
    val broker = new EmbeddedBroker(root)
    broker.createTopic("t", 1)
    broker.produce("t", Seq(rec(0)))

    withServiceDown(root) {
      // AddAsync_ShouldThrow_WhenKafkaIsDown: the failure is immediate
      // (no hang) and the error names the unreachable resource
      val e = intercept[Exception](broker.produce("t", Seq(rec(1))))
      assert(e.getMessage != null && e.getMessage.contains("broker"),
        s"error should name the broker path, got: ${e.getMessage}")
    }

    // service restored: the SAME broker handle produces again and the
    // log is intact (the reference re-produces after StartServiceAsync)
    broker.produce("t", Seq(rec(2)))
    assert(broker.fetch("t", 0).map(r => new String(r.value, "UTF-8")) == Seq("v0", "v2"))
  }

  test("ErrorAction.Retry: the write retries its budget, then the batch lands in the DLQ as envelopes") {
    val root = java.nio.file.Files.createTempDirectory("graft_fault_r").toString + "/broker"
    val dlq = root + "_dlq"
    val broker = new EmbeddedBroker(root)
    broker.createTopic("t", 1)
    val batch = Seq(("k1", "v1"), ("k2", "v2")).toDF("key", "value")

    var attempts = 0
    val guarded = ErrorSink.guardedForeachBatch(
      spark, "orders_srvdown", ErrorAction.Retry, dlq, maxRetries = 3, initialDelayMs = 1) { b =>
      attempts += 1
      val frames = b.collect().map(r =>
        ProducerRecord(r.getString(0).getBytes("UTF-8"), r.getString(1).getBytes("UTF-8"), 1L))
      broker.produce("t", frames.toSeq)
    }
    withServiceDown(root) { guarded(batch, 0L) }

    assert(attempts == 3, s"Retry must exhaust its budget, made $attempts attempts")
    val envelopes = spark.read.parquet(dlq)
    assert(envelopes.count() == 2)
    val row = envelopes.select("source", "error_phase").head
    assert(row.getString(0) == "orders_srvdown")
    assert(row.getString(1).contains("broker"), s"envelope should carry the cause: ${row.getString(1)}")
    assert(envelopes.select("raw").as[String].collect().forall(_.contains("\"key\"")))

    // after restart the same guarded writer succeeds and nothing new hits the DLQ
    guarded(batch, 1L)
    assert(broker.fetch("t", 0).size == 2)
    assert(spark.read.parquet(dlq).count() == 2)
  }

  test("ErrorAction.Skip drops the failed batch; Dlq routes it in one attempt") {
    val root = java.nio.file.Files.createTempDirectory("graft_fault_s").toString + "/broker"
    val dlqSkip = root + "_dlq_skip"
    val dlqDlq = root + "_dlq_dlq"
    val broker = new EmbeddedBroker(root)
    broker.createTopic("t", 1)
    val batch = Seq(("k1", "v1")).toDF("key", "value")

    var skipAttempts = 0
    val skip = ErrorSink.guardedForeachBatch(
      spark, "src", ErrorAction.Skip, dlqSkip, initialDelayMs = 1) { b =>
      skipAttempts += 1; broker.produce("t", Seq(rec(0)))
    }
    var dlqAttempts = 0
    val straight = ErrorSink.guardedForeachBatch(
      spark, "src", ErrorAction.Dlq, dlqDlq, initialDelayMs = 1) { b =>
      dlqAttempts += 1; broker.produce("t", Seq(rec(0)))
    }
    withServiceDown(root) {
      skip(batch, 0L)
      straight(batch, 0L)
    }
    assert(skipAttempts == 1 && dlqAttempts == 1) // neither policy retries
    assert(!new java.io.File(dlqSkip).exists(), "Skip must not write a DLQ")
    assert(spark.read.parquet(dlqDlq).count() == 1)
  }

  test("tolerant vs strict: a non-matching retryWhen stops immediately (fail fast with the clear error)") {
    val root = java.nio.file.Files.createTempDirectory("graft_fault_t").toString + "/broker"
    val dlq = root + "_dlq"
    val broker = new EmbeddedBroker(root)
    broker.createTopic("t", 1)
    val batch = Seq(("k", "v")).toDF("key", "value")

    var attempts = 0
    // BigBang Tolerant: connection-class errors are NOT retried — the
    // operation fails immediately with the underlying cause preserved
    val tolerant = ErrorSink.guardedForeachBatch(
      spark, "src", ErrorAction.Retry, dlq, maxRetries = 5, initialDelayMs = 1,
      retryWhen = e => !String.valueOf(e.getMessage).contains("broker")) { _ =>
      attempts += 1; broker.produce("t", Seq(rec(0)))
    }
    withServiceDown(root) { tolerant(batch, 0L) }
    assert(attempts == 1, s"non-matching error must not retry, made $attempts attempts")
    assert(spark.read.parquet(dlq).select("error_phase").as[String].head().contains("broker"))
  }
}
