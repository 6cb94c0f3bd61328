package graft.sources

import graft.core.EntityModel
import graft.streaming.ErrorSink
import org.apache.spark.sql.types.{StringType, StructField, StructType}
import org.apache.spark.sql.{DataFrame, SparkSession}

/** Schema-enforced readers for text source formats (JSON lines / CSV),
  * batch and streaming, with the reference's deserialization-error
  * policy wired in: records that fail to parse are captured PERMISSIVE
  * into `_corrupt_record` and routed to DLQ envelopes
  * (`DeserializationErrorPolicy`, `EntityModel.cs:125` +
  * `DlqEnvelope`) rather than poisoning the stream.
  *
  * The entity's declared schema is authoritative — like the
  * reference's Avro-registered schemas, readers never infer.
  */
object FormatSources {

  private def schemaWithCorrupt(m: EntityModel[_]): StructType =
    StructType(m.schema.fields :+ StructField(ErrorSink.CorruptCol, StringType))

  /** Batch JSON-lines read: (good rows, DLQ envelopes). The parsed
    * frame is cached before the split — Spark disallows projecting only
    * `_corrupt_record` straight off a raw file scan
    * (QUERY_ONLY_CORRUPT_RECORD_COLUMN).
    */
  def json(spark: SparkSession, m: EntityModel[_], path: String): (DataFrame, DataFrame) = {
    val raw = spark.read
      .schema(schemaWithCorrupt(m))
      .option("mode", "PERMISSIVE")
      .option("columnNameOfCorruptRecord", ErrorSink.CorruptCol)
      .json(path)
      .cache()
    ErrorSink.splitCorrupt(raw, m.name)
  }

  /** Batch CSV read with header: (good rows, DLQ envelopes). */
  def csv(spark: SparkSession, m: EntityModel[_], path: String): (DataFrame, DataFrame) = {
    val raw = spark.read
      .schema(schemaWithCorrupt(m))
      .option("header", "true")
      .option("mode", "PERMISSIVE")
      .option("columnNameOfCorruptRecord", ErrorSink.CorruptCol)
      .csv(path)
      .cache()
    ErrorSink.splitCorrupt(raw, m.name)
  }

  /** Streaming JSON-lines source (directory-watching), good rows only —
    * corrupt records flow to `dlqSink` via the same split inside each
    * micro-batch when materialized with `foreachBatch`.
    */
  def jsonStream(spark: SparkSession, m: EntityModel[_], path: String): DataFrame =
    spark.readStream
      .schema(schemaWithCorrupt(m))
      .option("mode", "PERMISSIVE")
      .option("columnNameOfCorruptRecord", ErrorSink.CorruptCol)
      .json(path)
}
