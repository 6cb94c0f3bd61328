package graft

import graft.streaming.Supervisor
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream

import java.nio.file.Files
import java.util.concurrent.atomic.AtomicInteger

/** Self-healing: a query that fails its first micro-batch is restarted
  * from its checkpoint by the supervisor and then succeeds.
  */
class SupervisorSpec extends SparkSpec {
  import spark.implicits._

  test("failed query restarts from checkpoint and completes") {
    implicit val sqlCtx = spark.sqlContext
    val chk = Files.createTempDirectory("sup-chk").toString
    val attempts = new AtomicInteger(0)
    val processed = new AtomicInteger(0)

    val mem = MemoryStream[Int]
    mem.addData(1, 2, 3)

    val sup = new Supervisor(spark, maxRestarts = 3, backoffMs = 50)
    try {
      val q = sup.supervise("flaky") { () =>
        mem.toDS().writeStream
          .option("checkpointLocation", chk)
          .foreachBatch { (batch: org.apache.spark.sql.Dataset[Int], _: Long) =>
            if (attempts.getAndIncrement() == 0) sys.error("first batch fails")
            processed.addAndGet(batch.collect().length)
            ()
          }
          .start()
      }
      intercept[Exception](q.awaitTermination()) // first incarnation dies
      // supervisor restarts asynchronously; poll until data lands
      val deadline = System.currentTimeMillis() + 30000
      while (processed.get() < 3 && System.currentTimeMillis() < deadline)
        Thread.sleep(100)
      assert(sup.restartCount("flaky") >= 1)
      assert(processed.get() == 3) // exactly once: checkpoint replay, no dup
    } finally sup.close()
  }

  test("one stage's backoff does not block another stage's restart") {
    // backoff runs on the supervisor's scheduler, NOT the shared
    // listener bus thread: two stages failing together must both be
    // healed after ONE backoff period. The old sleep-in-listener shape
    // serialized them — stage B's termination event (and so its
    // restart) waited out stage A's full backoff first.
    implicit val sqlCtx = spark.sqlContext
    val backoffMs = 4000L
    val sup = new Supervisor(spark, maxRestarts = 3, backoffMs = backoffMs)
    try {
      val processed = Map("a" -> new AtomicInteger(0), "b" -> new AtomicInteger(0))
      val failed = Map("a" -> new AtomicInteger(0), "b" -> new AtomicInteger(0))
      val queries = Seq("a", "b").map { name =>
        val chk = Files.createTempDirectory(s"sup-iso-$name").toString
        val mem = MemoryStream[Int]
        mem.addData(1, 2, 3)
        name -> sup.supervise(name) { () =>
          mem.toDS().writeStream
            .option("checkpointLocation", chk)
            .foreachBatch { (batch: org.apache.spark.sql.Dataset[Int], _: Long) =>
              if (failed(name).getAndIncrement() == 0) sys.error(s"$name first batch fails")
              processed(name).addAndGet(batch.collect().length)
              ()
            }
            .start()
        }
      }
      queries.foreach { case (_, q) => intercept[Exception](q.awaitTermination()) }
      val bothDown = System.currentTimeMillis()
      val deadline = bothDown + 2 * backoffMs - 500 // < two serialized backoffs
      while ((processed("a").get() < 3 || processed("b").get() < 3) &&
        System.currentTimeMillis() < deadline) Thread.sleep(100)
      assert(processed("a").get() == 3 && processed("b").get() == 3,
        s"both stages must heal within ~one backoff, not ${2 * backoffMs} ms " +
          s"(a=${processed("a").get()}, b=${processed("b").get()})")
    } finally sup.close()
  }
}
