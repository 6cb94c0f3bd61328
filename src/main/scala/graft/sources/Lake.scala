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

  /** Z-order-clustered write — the THIRD storage axis: day partitions
    * prune on time, bucketing co-locates joins, and Z-ordering makes
    * parquet min/max stats prune MULTI-dimensional range predicates on
    * any of `zCols`, not just a leading sort column. A linear sort by
    * (a, b) leaves every file spanning all of `b`; the Morton curve
    * gives each file a compact hyper-rectangle, so a `b`-only filter
    * skips all but ~1/2^bits of the row groups (ZOrderSpec measures
    * exactly this from scan metrics).
    *
    * Scale shape: one pass computes per-column quantile boundaries
    * (`approx_percentile`, all columns in a single aggregate); the
    * Z-key is a broadcast-literal native expression
    * ([[graft.functions.ZValue]], binary-search + bit-interleave per
    * row); `repartitionByRange` on the key gives every output task a
    * contiguous Z-range (one range shuffle — the same exchange any
    * clustering write pays) and `sortWithinPartitions` orders inside
    * each file so row groups nest inside the file's rectangle. No
    * window, no global sort, no driver data path beyond the bounded
    * boundary arrays.
    *
    * `zCols` must be numeric/date/timestamp (rank needs an order);
    * hash a string column first if equality-only pruning is enough.
    */
  def writeZOrdered(
      df: DataFrame,
      zCols: Seq[String],
      path: String,
      bits: Int = 8,
      numFiles: Int = 64,
      maxRecordsPerFile: Long = 0L
  ): Unit = {
    require(zCols.nonEmpty, "writeZOrdered needs at least one column")
    val ranked = zCols.map(c => col(c).cast("double").as(s"__zr_$c"))
    val probes = (1 until (1 << bits)).map(_.toDouble / (1 << bits))
    val qAgg = zCols.map(c =>
      expr(s"approx_percentile(`__zr_$c`, array(${probes.mkString(",")}))")
        .as(s"__q_$c"))
    val qRow = df.select(ranked: _*).agg(qAgg.head, qAgg.tail: _*).head()
    val boundaries = zCols.indices.map { i =>
      qRow.getSeq[Double](i).toArray
    }
    val zed = df.withColumn(
      "__z",
      org.apache.spark.sql.graftbridge.ColumnBridge.column(
        graft.functions.ZValue(
          zCols.map(c =>
            org.apache.spark.sql.graftbridge.ColumnBridge
              .expression(col(c).cast("double"))),
          boundaries,
          bits)))
    zed
      .repartitionByRange(numFiles, col("__z"))
      .sortWithinPartitions(col("__z"))
      .drop("__z")
      .write
      .option("maxRecordsPerFile", maxRecordsPerFile)
      .mode("overwrite")
      .parquet(path)
  }
}
