package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

/** Per-key distributional anomaly detection over metric streams — the
  * batch face of the monitoring queries the reference runs as push-mode
  * KSQL aggregates (ref: src/Query/Builders/ProjectionBuilder.cs
  * Sum/Count/Avg map; the reference stops at the aggregate, flagging is
  * client-side). Here flagging is part of the plan.
  *
  * Determinism contract (this is oracle-gated): the per-key moments are
  * accumulated in DECIMAL, so `s1`/`s2` are EXACT — independent of
  * partitioning and summation order — and every downstream double op
  * (sub/div/sqrt) is IEEE-correctly-rounded, giving bit-identical
  * z-scores on any engine that sums the same decimals. A plain double
  * `avg`/`stddev` would drift with partition count and flip rounded
  * values near bucket boundaries (see QueryPack conventions).
  *
  * Scale shape: ONE map-side-combinable hash aggregate over the metric
  * (3 decimal/long cells per key), broadcast of the key-cardinality
  * stats table back onto the scan, and a scan-local filter — the corpus
  * is read once and never shuffles. Keys here are type/category-like
  * (bounded cardinality); for unbounded keys swap the broadcast for a
  * shuffled join, the moments math is unchanged.
  */
object Anomaly {

  /** Rows whose `valueCol` deviates more than `threshold` sample
    * standard deviations from their `keyCol` group mean. Keeps
    * `keepCols`, appends `z` rounded to 6 dp.
    */
  def zScoreOutliers(
      df: DataFrame,
      keyCol: String,
      valueCol: String,
      keepCols: Seq[String],
      threshold: Double = 2.5
  ): DataFrame = {
    require(threshold > 0, "threshold must be positive")
    val vd = col(valueCol).cast(DecimalType(18, 6))
    val stats = df
      .groupBy(col(keyCol))
      .agg(
        sum(vd).cast("double").as("__s1"),
        sum(vd * vd).cast("double").as("__s2"),
        count(lit(1)).as("__n"))
    val mean = col("__s1") / col("__n")
    val variance =
      (col("__s2") - col("__s1") * col("__s1") / col("__n")) / (col("__n") - 1)
    val z = (col(valueCol) - mean) / sqrt(variance)
    df.join(broadcast(stats), keyCol)
      .filter(abs(z) > threshold)
      .select(keepCols.map(col) :+ col(keyCol) :+ col(valueCol) :+
        round(z, 6).as("z"): _*)
  }
}
