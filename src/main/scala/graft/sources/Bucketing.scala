package graft.sources

import graft.core.EntityModel
import org.apache.spark.sql.{DataFrame, SparkSession}

/** Co-partitioned storage for repeated fact-fact joins — the Spark
  * analog of the reference's co-partitioned-topic join requirement
  * (`/root/reference/src/Query/Builders/Common/JoinLimitationEnforcer.cs:45`
  * "Supported: INNER, LEFT OUTER joins with co-partitioned data"; the
  * :130-139 warning demands "same partition count and key
  * distribution").
  *
  * In Kafka/ksqlDB co-partitioning is a pre-condition the USER
  * arranges; in Spark it is a storage layout the engine arranges:
  * writing both sides `bucketBy(n, key)` + `sortBy(key)` pins each key
  * to a deterministic bucket file, so a later equi-join on the bucket
  * key needs NO Exchange on either side (and with sorted buckets, no
  * Sort either) — the join runs bucket-by-bucket. At 100 TB this is the
  * difference between re-shuffling a fact table per join and paying the
  * shuffle ONCE at write time, amortized over every downstream
  * join/aggregation on that key.
  *
  * The entity's Kafka-facing config maps directly: `partitions` →
  * bucket count, `keys` → bucket columns ([[EntityModel]] `partitions`
  * / `keys`, reference `EntityModel.cs:30,:47`). Mismatched bucket
  * counts between two entities degrade to a normal shuffled join
  * (Spark reads bucketed scans but adds the Exchange back) — same
  * failure mode ksqlDB warns about, but correct instead of wrong.
  */
object Bucketing {

  /** Persist `df` as a bucketed+sorted external table at `path`,
    * co-partitioned on the entity's key columns with the entity's
    * partition count as the bucket count.
    */
  def materialize(
      df: DataFrame,
      model: EntityModel[_],
      path: String,
      tableName: Option[String] = None
  ): String = {
    require(model.hasKeys, s"entity '${model.name}' needs keys to bucket on")
    require(model.partitions > 0, "bucket count must be positive")
    val name = tableName.getOrElse(s"${model.name}_bucketed")
    df.write
      .mode("overwrite")
      .option("path", path)
      .bucketBy(model.partitions, model.keys.head, model.keys.drop(1): _*)
      .sortBy(model.keys.head, model.keys.drop(1): _*)
      .saveAsTable(name)
    name
  }

  /** Join two co-bucketed tables on `keys`. The plan contract (asserted
    * in BucketingSpec): both scans report the bucket layout and the
    * join has no Exchange under it when the bucket specs line up.
    */
  def coLocatedJoin(
      spark: SparkSession,
      leftTable: String,
      rightTable: String,
      keys: Seq[String],
      joinType: String = "inner"
  ): DataFrame =
    spark.table(leftTable).join(spark.table(rightTable), keys, joinType)
}
