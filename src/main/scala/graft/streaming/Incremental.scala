package graft.streaming

import org.apache.spark.sql.streaming.Trigger
import org.apache.spark.sql.types.StructType
import org.apache.spark.sql.{DataFrame, SparkSession}

/** Incremental batch processing over a growing directory — the
  * parquet-source analog of the reference's committed consumer offsets
  * (`/root/reference/src/Messaging/Consumers/KafkaConsumerManager.cs`:
  * a consumer group resumes from its committed position; here the
  * streaming checkpoint is the committed position over FILES).
  *
  * Each invocation processes exactly the files that arrived since the
  * last run (`Trigger.AvailableNow`), applies the transform, appends
  * to the output, and stops. This is how a 100 TB corpus is curated in
  * practice: a periodic job that touches only the day's new shards —
  * re-running after a crash reprocesses nothing (file offsets commit
  * per micro-batch), and `maxFilesPerTrigger` bounds a backlog
  * catch-up into executor-sized batches instead of one giant batch.
  *
  * The transform runs under streaming constraints (no multi-pass
  * operators); per-row curation signals, gates, scrubbing, and
  * watermarked/stateful steps all qualify.
  */
object Incremental {

  def runOnce(
      spark: SparkSession,
      inDir: String,
      schema: StructType,
      checkpointDir: String,
      outDir: String,
      transform: DataFrame => DataFrame,
      maxFilesPerTrigger: Int = 1000
  ): Unit = {
    val src = spark.readStream
      .schema(schema)
      .option("maxFilesPerTrigger", maxFilesPerTrigger)
      .parquet(inDir)
    val q = transform(src).writeStream
      .format("parquet")
      .option("path", outDir)
      .option("checkpointLocation", checkpointDir)
      .outputMode("append")
      .trigger(Trigger.AvailableNow())
      .start()
    q.awaitTermination()
  }
}
