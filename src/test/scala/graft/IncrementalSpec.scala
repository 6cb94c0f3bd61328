package graft

import graft.operators.Curation
import graft.streaming.Incremental
import org.apache.spark.sql.functions._

import java.nio.file.Files

/** Incremental (Trigger.AvailableNow) batch runs: each invocation
  * processes only files committed since the last run — the periodic
  * 100 TB ingestion cadence, exactly-once across restarts.
  */
class IncrementalSpec extends SparkSpec {
  import spark.implicits._

  test("successive runs process only newly arrived files, exactly once") {
    val root = Files.createTempDirectory("graft_incr").toString
    val in = s"$root/in"
    val out = s"$root/out"
    val ckpt = s"$root/ckpt"

    val schema = Seq((1L, "x")).toDF("id", "text").schema
    def arrive(ids: Range): Unit = ids.map(i => (i.toLong, s"doc $i text"))
      .toDF("id", "text").coalesce(1).write.mode("append").parquet(in)
    def curatePass(df: org.apache.spark.sql.DataFrame) =
      df.select($"id", Curation.normalize(Curation.scrubPii($"text")).as("clean"))

    arrive(0 until 10)
    Incremental.runOnce(spark, in, schema, ckpt, out, curatePass)
    assert(spark.read.parquet(out).count() == 10)

    // day 2: only the 5 new rows are processed (no duplicates of day 1)
    arrive(10 until 15)
    Incremental.runOnce(spark, in, schema, ckpt, out, curatePass)
    val rows = spark.read.parquet(out)
    assert(rows.count() == 15)
    assert(rows.select($"id").distinct().count() == 15)

    // re-run with nothing new: a no-op, still 15
    Incremental.runOnce(spark, in, schema, ckpt, out, curatePass)
    assert(spark.read.parquet(out).count() == 15)
  }
}
