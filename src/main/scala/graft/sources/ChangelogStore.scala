package graft.sources

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.{DataFrame, SparkSession}

import java.util.concurrent.atomic.AtomicLong

/** File-backed changelog store — the produce/compaction semantics of a
  * keyed Kafka topic, over parquet.
  *
  * The reference's write path (`AddAsync` → Avro produce,
  * `/root/reference/src/EntitySets/EventSet.cs:148-161`; `RemoveAsync`
  * → tombstone) appends key/value records to a compacted topic; readers
  * see the latest value per key, tombstones delete. Here: appends carry
  * `__seq`/`__op` columns; [[snapshot]] compacts with one window over
  * the key (max-seq row per key, tombstones dropped) — the same
  * log-compaction a KTable reader performs, and at scale a single
  * shuffle by key.
  */
final class ChangelogStore(spark: SparkSession, root: String) {

  private val seq = new AtomicLong(0)

  private def path(entity: String) = s"$root/$entity"

  /** Produce (upsert) rows. */
  def add(entity: String, rows: DataFrame): Unit =
    add(entity, rows, Map.empty)

  /** Produce with record headers (`AddAsync(entity, headers)`,
    * `/root/reference/src/EntitySets/EventSet.cs:148-161`): headers ride
    * as a `__headers` map column on the changelog — visible to log
    * readers and [[graft.EventSet.forEachWithMeta]], dropped from the
    * compacted value snapshot like Kafka header metadata.
    */
  def add(entity: String, rows: DataFrame, headers: Map[String, String]): Unit = {
    val headerCol =
      if (headers.isEmpty) map().cast("map<string,string>")
      else map(headers.toSeq.flatMap { case (k, v) => Seq(lit(k), lit(v)) }: _*)
    rows
      .withColumn("__seq", lit(seq.incrementAndGet()) * 1000000 + monotonically_increasing_id() % 1000000)
      .withColumn("__op", lit("u"))
      .withColumn("__headers", headerCol)
      .write.mode("append").parquet(path(entity))
  }

  /** Tombstone rows (RemoveAsync analog). `keyRows` must carry the full
    * entity schema (only the key columns matter — a Kafka tombstone is
    * key + null value; a uniform schema keeps the parquet log readable
    * without schema merging).
    */
  def remove(entity: String, keyRows: DataFrame): Unit =
    keyRows
      .withColumn("__seq", lit(seq.incrementAndGet()) * 1000000 + monotonically_increasing_id() % 1000000)
      .withColumn("__op", lit("d"))
      .withColumn("__headers", map().cast("map<string,string>"))
      .write.mode("append").parquet(path(entity))

  /** Raw changelog (the "topic"): every produce in order. */
  def log(entity: String): DataFrame = spark.read.parquet(path(entity))

  /** Compacted view: latest row per key, tombstones removed. */
  def snapshot(entity: String, keys: Seq[String]): DataFrame = {
    val w = Window.partitionBy(keys.map(col): _*).orderBy(col("__seq").desc)
    log(entity)
      .withColumn("__rn", row_number().over(w))
      .filter(col("__rn") === 1 && col("__op") === "u")
      .drop("__rn", "__seq", "__op", "__headers")
  }

  def exists(entity: String): Boolean = new java.io.File(path(entity)).exists()
}
