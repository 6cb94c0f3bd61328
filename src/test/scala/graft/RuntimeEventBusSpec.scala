package graft

import graft.core.ErrorAction
import graft.streaming.{ErrorSink, RuntimeEvent, RuntimeEventBus, RuntimeEventSink, Supervisor}
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream

import java.nio.file.Files
import java.util.concurrent.CopyOnWriteArrayList
import java.util.concurrent.atomic.AtomicInteger
import scala.jdk.CollectionConverters._

/** Runtime-event / incident surface (reference
  * `src/Events/RuntimeEventBus.cs`, `src/Incidents/IncidentBus.cs`):
  * the supervisor's self-healing loop and the DLQ arm are observable
  * through a sink registry — query started / failed / restarted /
  * gave-up and the envelope write each emit one event — and a
  * throwing sink never breaks the pipeline it observes.
  */
class RuntimeEventBusSpec extends SparkSpec {
  import spark.implicits._

  private final class Collecting extends RuntimeEventSink {
    val events = new CopyOnWriteArrayList[RuntimeEvent]()
    override def publish(e: RuntimeEvent): Unit = events.add(e)
    def names: Seq[String] = events.asScala.map(_.name).toSeq
  }

  test("supervised self-heal emits started, failed, restarted in order") {
    implicit val sqlCtx = spark.sqlContext
    val sink = new Collecting
    val chk = Files.createTempDirectory("evt-chk").toString
    val attempts = new AtomicInteger(0)
    val processed = new AtomicInteger(0)
    val mem = MemoryStream[Int]
    mem.addData(1, 2, 3)

    val sup = new Supervisor(spark, maxRestarts = 3, backoffMs = 50, onEvent = sink.publish)
    try {
      val q = sup.supervise("flaky_evt") { () =>
        mem.toDS().writeStream
          .option("checkpointLocation", chk)
          .foreachBatch { (batch: org.apache.spark.sql.Dataset[Int], _: Long) =>
            if (attempts.getAndIncrement() == 0) sys.error("first batch fails")
            processed.addAndGet(batch.collect().length)
            ()
          }
          .start()
      }
      intercept[Exception](q.awaitTermination())
      val deadline = System.currentTimeMillis() + 30000
      while (processed.get() < 3 && System.currentTimeMillis() < deadline)
        Thread.sleep(100)
      assert(processed.get() == 3)
      // restart event may race the data landing by a hair; poll for it
      val d2 = System.currentTimeMillis() + 5000
      while (!sink.names.contains("query.restarted") && System.currentTimeMillis() < d2)
        Thread.sleep(50)
      val names = sink.names
      assert(names.indexOf("query.started") >= 0, s"events: $names")
      assert(names.indexOf("query.failed") > names.indexOf("query.started"), s"events: $names")
      assert(names.indexOf("query.restarted") > names.indexOf("query.failed"), s"events: $names")
      val restarted = sink.events.asScala.find(_.name == "query.restarted").get
      assert(restarted.entity == "flaky_evt" && restarted.attempt.contains(1))
      val failedEvt = sink.events.asScala.find(_.name == "query.failed").get
      assert(failedEvt.success.contains(false) && failedEvt.message.nonEmpty)
    } finally sup.close()
  }

  test("restarts exhausted emits query.gave_up") {
    implicit val sqlCtx = spark.sqlContext
    val sink = new Collecting
    val chk = Files.createTempDirectory("evt-gaveup-chk").toString
    val mem = MemoryStream[Int]
    mem.addData(1)

    val sup = new Supervisor(spark, maxRestarts = 0, backoffMs = 50, onEvent = sink.publish)
    try {
      val q = sup.supervise("hopeless") { () =>
        mem.toDS().writeStream
          .option("checkpointLocation", chk)
          .foreachBatch { (_: org.apache.spark.sql.Dataset[Int], _: Long) =>
            sys.error("always fails"); ()
          }
          .start()
      }
      intercept[Exception](q.awaitTermination())
      val deadline = System.currentTimeMillis() + 10000
      while (!sink.names.contains("query.gave_up") && System.currentTimeMillis() < deadline)
        Thread.sleep(50)
      assert(sink.names.contains("query.gave_up"), s"events: ${sink.names}")
      assert(!sink.names.contains("query.restarted"))
    } finally sup.close()
  }

  test("DLQ envelope write and Skip each emit one incident with the batch id") {
    val sink = new Collecting
    val dlq = Files.createTempDirectory("evt-dlq").toString + "/dlq"
    val batch = Seq((1L, "a"), (2L, "b")).toDF("id", "v")

    val toDlq = ErrorSink.guardedForeachBatch(
      spark, "orders_src", ErrorAction.Dlq, dlq,
      onEvent = sink.publish)(_ => sys.error("boom"))
    toDlq(batch, 7L)
    val dlqEvt = sink.events.asScala.find(_.name == "dlq.enqueue").get
    assert(dlqEvt.entity == "orders_src" && dlqEvt.batchId.contains(7L) &&
      dlqEvt.message.exists(_.contains("boom")))
    assert(spark.read.parquet(dlq).count() == 2) // envelope rows written

    val skipper = ErrorSink.guardedForeachBatch(
      spark, "orders_src", ErrorAction.Skip, dlq,
      onEvent = sink.publish)(_ => sys.error("boom"))
    skipper(batch, 8L)
    assert(sink.events.asScala.exists(e => e.name == "batch.skip" && e.batchId.contains(8L)))
    assert(spark.read.parquet(dlq).count() == 2) // skip wrote nothing
  }

  test("a throwing sink is contained: delivery continues and the pipeline survives") {
    val boom = new RuntimeEventSink {
      override def publish(e: RuntimeEvent): Unit = sys.error("sink is broken")
    }
    val sink = new Collecting
    RuntimeEventBus.addSink(boom)
    RuntimeEventBus.addSink(sink)
    try {
      // bus-level containment: the broken sink doesn't stop the second
      RuntimeEventBus.publish(RuntimeEvent("test.evt", "e", 0L))
      assert(sink.names == Seq("test.evt"))

      // emitter-level containment: guardedForeachBatch with the DEFAULT
      // bus callback (broken sink registered) still writes the envelope
      val dlq = Files.createTempDirectory("evt-dlq2").toString + "/dlq"
      val toDlq = ErrorSink.guardedForeachBatch(
        spark, "src2", ErrorAction.Dlq, dlq)(_ => sys.error("boom"))
      toDlq(Seq((1L, "x")).toDF("id", "v"), 1L)
      assert(spark.read.parquet(dlq).count() == 1)
      assert(sink.events.asScala.exists(_.name == "dlq.enqueue"))
    } finally {
      RuntimeEventBus.removeSink(boom)
      RuntimeEventBus.removeSink(sink)
    }
  }
}
