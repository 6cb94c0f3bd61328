package graft.examples

import graft.streaming.Supervisor
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream

import java.util.concurrent.atomic.AtomicInteger

/** The reference's runtime-events + self-healing queries
  * (`/root/reference/examples/runtime-events/`; restart policy in
  * `src/Runtime/...`): a persistent query dies, the runtime observes
  * the termination event and restarts it from its checkpoint.
  *
  * graft analog: `Supervisor.supervise(name)(start)` — a
  * `StreamingQueryListener` catches `QueryTerminated` with an error
  * and relaunches with backoff, up to `maxRestarts`; Structured
  * Streaming's checkpoint replays the failed batch, so the restart is
  * exactly-once (the demo counts processed records to prove no
  * duplicates).
  *
  * Run: `sbt "runMain graft.examples.RuntimeEvents"`
  */
object RuntimeEvents {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext

    val chk = java.nio.file.Files.createTempDirectory("rt_events_chk").toString
    val attempts = new AtomicInteger(0)
    val processed = new AtomicInteger(0)

    val mem = MemoryStream[Int]
    mem.addData(1, 2, 3)

    val sup = new Supervisor(spark, maxRestarts = 3, backoffMs = 100)
    try {
      val q = sup.supervise("flaky_job") { () =>
        mem.toDS().writeStream
          .option("checkpointLocation", chk)
          .foreachBatch { (batch: org.apache.spark.sql.Dataset[Int], _: Long) =>
            if (attempts.getAndIncrement() == 0)
              sys.error("simulated transient failure on first batch")
            processed.addAndGet(batch.collect().length)
            ()
          }
          .start()
      }
      try q.awaitTermination()
      catch { case e: Exception => println(s"first incarnation died: ${e.getMessage.linesIterator.next()}") }

      val deadline = System.currentTimeMillis() + 30000
      while (processed.get() < 3 && System.currentTimeMillis() < deadline)
        Thread.sleep(100)

      println(s"restarts: ${sup.restartCount("flaky_job")}")
      println(s"processed after self-heal: ${processed.get()} records (checkpoint replay, no duplicates)")
    } finally { sup.close(); spark.stop() }
  }
}
