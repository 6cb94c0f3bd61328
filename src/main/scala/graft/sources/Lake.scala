package graft.sources

import org.apache.spark.sql.functions._
import org.apache.spark.sql.{DataFrame, SparkSession}

/** Date-partitioned storage layout — the second storage axis (with
  * [[Bucketing]]) a 100 TB corpus needs: data lands in day shards, and
  * every time-bounded read must PRUNE partitions at planning time
  * rather than scan-and-filter. The reference gets this from Kafka
  * retention + offsets-by-timestamp; a lake gets it from directory
  * layout (`day=YYYY-MM-DD/`) + Catalyst partition pruning.
  *
  * At 100 TB with ~3 years of dailies, a one-week query over a pruned
  * layout reads 7/1000ths of the files; unpartitioned, it reads
  * everything and filters after decode. LakeSpec asserts the pruned
  * file count from the executed scan node, not just the filter's
  * presence.
  */
object Lake {

  /** Write `df` partitioned by the DATE of its event-time column. */
  def materializeByDay(
      df: DataFrame,
      timeCol: String,
      path: String
  ): Unit =
    df.withColumn("day", to_date(col(timeCol)))
      .write
      .mode("overwrite")
      .partitionBy("day")
      .parquet(path)

  /** Time-bounded read: the `day` predicate derives from the requested
    * range so pruning happens at file listing, before any decode.
    */
  def readRange(
      spark: SparkSession,
      path: String,
      timeCol: String,
      fromInclusive: String,
      toExclusive: String
  ): DataFrame =
    spark.read
      .parquet(path)
      .filter(
        col("day") >= to_date(lit(fromInclusive)) &&
          col("day") < to_date(lit(toExclusive)) &&
          col(timeCol) >= lit(fromInclusive).cast("timestamp") &&
          col(timeCol) < lit(toExclusive).cast("timestamp")
      )
}
