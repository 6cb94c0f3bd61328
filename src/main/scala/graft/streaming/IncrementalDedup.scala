package graft.streaming

import graft.operators.Dedup
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.StreamingQuery
import org.apache.spark.sql.{DataFrame, SparkSession}

/** Continuous-ingestion dedup — the end-to-end loop a training-data
  * pipeline runs forever: each arriving micro-batch is checked against
  * the existing corpus (band join against the PERSISTED corpus band
  * table, no corpus self-pairing and no re-shingling of the corpus),
  * survivors are deduplicated within the batch and appended to the
  * corpus AND to the band table, so the next batch dedups against
  * everything before it.
  *
  * Plan shape per micro-batch (all equi-joins, SCALE.md):
  *   1. [[Dedup.candidatesAgainstBanded]]: band the (small) batch, join
  *      against the stored band table — cost scales with |batch| plus
  *      the touched corpus buckets, never |corpus|²;
  *   2. exact-Jaccard verify of the candidates, anti-join the condemned
  *      batch ids (the corpus is canonical and never modified);
  *   3. within-batch [[Dedup.dropNearDuplicates]] (bounded by the batch
  *      size, not the corpus);
  *   4. append survivors + their [[Dedup.bandedSignatures]] rows.
  *
  * The band table is persisted UNCAPPED so it doubles as the free audit
  * source for [[Dedup.droppedBucketsFromBanded]] (see the WARNING
  * there); a hot-bucket cap belongs on the per-batch join, passed via
  * `maxBucketSize`.
  *
  * Exactly-once: `foreachBatch` replays a batch after a failure, and a
  * plain parquet append would then double-append. Production runs point
  * `corpusDir`/`bandsDir` at a transactional table format or key the
  * appends by batchId; the loop itself is idempotent in content (a
  * replayed batch re-dedups against the same corpus state only if the
  * append is atomic per batch).
  */
object IncrementalDedup {

  /** One micro-batch of the ingestion loop — steps 1–4 above, batch
    * API. Callable directly (unit tests, backfills) or from
    * [[attach]]'s `foreachBatch`.
    */
  def ingestBatch(
      spark: SparkSession,
      batch: DataFrame,
      corpusDir: String,
      bandsDir: String,
      idCol: String = "doc_id",
      textCol: String = "text",
      minJaccard: Double = 0.4,
      maxBucketSize: Option[Int] = None
  ): Unit = {
    val corpus = spark.read.parquet(corpusDir)
    val cands = Dedup
      .candidatesAgainstBanded(batch, spark.read.parquet(bandsDir), idCol, textCol,
        maxBucketSize = maxBucketSize)
      .select(col("new_id").as("doc1"), col("corpus_id").as("doc2"))
    val both = batch.select(col(idCol), col(textCol))
      .union(corpus.select(col(idCol), col(textCol)))
    val losers = Dedup
      .verifyCandidates(cands, both, idCol, textCol, minJaccard = minJaccard)
      .select(col("doc1").as(idCol)).distinct()
    val survivors0 = batch.join(losers, Seq(idCol), "left_anti")
    val survivors = Dedup.dropNearDuplicates(
      survivors0, idCol, textCol, minJaccard = minJaccard, maxBucketSize = maxBucketSize)
    survivors.write.mode("append").parquet(corpusDir)
    Dedup.bandedSignatures(survivors, idCol, textCol)
      .write.mode("append").parquet(bandsDir)
  }

  /** Attach the ingestion loop to a streaming frame of (idCol, textCol)
    * documents: every micro-batch runs [[ingestBatch]]. The caller owns
    * the returned query's lifecycle (awaitTermination / stop).
    */
  def attach(
      arriving: DataFrame,
      corpusDir: String,
      bandsDir: String,
      idCol: String = "doc_id",
      textCol: String = "text",
      minJaccard: Double = 0.4,
      maxBucketSize: Option[Int] = None,
      checkpointLocation: Option[String] = None
  ): StreamingQuery = {
    val spark = arriving.sparkSession
    val writer = arriving.writeStream
      .outputMode("append")
      .foreachBatch { (batch: DataFrame, _: Long) =>
        ingestBatch(spark, batch, corpusDir, bandsDir, idCol, textCol,
          minJaccard, maxBucketSize)
      }
    checkpointLocation
      .fold(writer)(c => writer.option("checkpointLocation", c))
      .start()
  }
}
