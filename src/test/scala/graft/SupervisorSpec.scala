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
}
