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
  ): DataFrame = {
    // a toExclusive with a time-of-day component (e.g. '...-10 12:00')
    // needs the partial final day's PARTITION (inclusive day bound, the
    // row-level timeCol bound enforces the exclusivity); a midnight-
    // exact bound excludes that day entirely
    val toLdt = java.time.LocalDateTime.parse(
      if (toExclusive.length == 10) s"${toExclusive}T00:00:00"
      else toExclusive.replace(' ', 'T')
    )
    val midnightExact = toLdt.toLocalTime == java.time.LocalTime.MIDNIGHT
    val dayUpper =
      if (midnightExact) col("day") < to_date(lit(toExclusive))
      else col("day") <= to_date(lit(toExclusive))
    spark.read
      .parquet(path)
      .filter(
        col("day") >= to_date(lit(fromInclusive)) && dayUpper &&
          col(timeCol) >= lit(fromInclusive).cast("timestamp") &&
          col(timeCol) < lit(toExclusive).cast("timestamp")
      )
  }
}
