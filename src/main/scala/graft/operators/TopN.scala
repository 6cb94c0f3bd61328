package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Top-N-per-key: the distributed generalization of the reference's
  * EventSet newest-N pull (`EventSetLimitExtensions` keeps the newest
  * records, not an arbitrary head — see `GraftContext.latest` for the
  * collect-at-client form). Here the result STAYS a DataFrame: rank
  * within each key by event time descending and keep `n`.
  *
  * Scale shape: one shuffle on the key, then a per-partition sort —
  * Spark plans rank-filter windows with a WindowGroupLimit pushdown
  * (partial top-N before the shuffle on 3.5+/4.x), so the exchanged
  * data is O(n × keys), not the full table.
  */
object TopN {

  def newestPerKey(
      df: DataFrame,
      keyCol: String,
      timeCol: String,
      tieCol: String,
      n: Int
  ): DataFrame = {
    require(n > 0, "n must be positive")
    val w = Window
      .partitionBy(col(keyCol))
      .orderBy(col(timeCol).desc, col(tieCol).desc)
    df.withColumn("rank", row_number().over(w)).filter(col("rank") <= n)
  }
}
