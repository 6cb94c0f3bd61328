package graft.operators

import org.apache.spark.sql.functions._
import org.apache.spark.sql.{Column, DataFrame}

/** Skew mitigation for hot grouping keys.
  *
  * A single hot key (one exchange symbol with half the ticks, one
  * boilerplate document hash with 10⁹ duplicates) serializes a groupBy
  * into one reducer at 100 TB. Two-phase salted aggregation shards the
  * hot key across `saltFactor` partials first, then merges — both
  * stages are ordinary hash aggregations Catalyst pipelines with
  * map-side partial aggregation, so the overhead on non-skewed keys is
  * one cheap extra shuffle stage. (For JOIN skew, AQE's skew-join
  * splitting is enabled in the bench config and needs no code.)
  *
  * Only algebraic aggregates decompose this way — the caller supplies
  * the partial and merge column lists (e.g. partial `sum(x) as s`,
  * merge `sum(s) as s`; for AVG use the SUM+COUNT decomposition,
  * `BarCascade.avgDecomposed`).
  */
object Skew {

  def saltedAgg(
      df: DataFrame,
      keys: Seq[String],
      saltFactor: Int
  )(partial: Seq[Column], merge: Seq[Column]): DataFrame = {
    require(saltFactor > 1, "saltFactor must be > 1")
    val salted = df.withColumn(
      "__salt",
      pmod(spark_partition_id() + monotonically_increasing_id(), lit(saltFactor))
    )
    val stage1 = salted
      .groupBy((keys.map(col) :+ col("__salt")): _*)
      .agg(partial.head, partial.tail: _*)
    stage1
      .groupBy(keys.map(col): _*)
      .agg(merge.head, merge.tail: _*)
  }

  /** Convenience: salted SUM + COUNT. */
  def saltedSumCount(
      df: DataFrame,
      keys: Seq[String],
      valueCol: String,
      saltFactor: Int = 16
  ): DataFrame =
    saltedAgg(df, keys, saltFactor)(
      Seq(sum(col(valueCol)).as("__s"), count(lit(1)).as("__c")),
      Seq(sum(col("__s")).as("sum_value"), sum(col("__c")).as("cnt"))
    )
}
