package graft.sources

import graft.core.EntityModel
import org.apache.avro.generic.{GenericData, GenericDatumReader, GenericDatumWriter, GenericRecord}
import org.apache.avro.io.{DecoderFactory, EncoderFactory}
import org.apache.avro.Schema
import org.apache.spark.sql.types._
import org.apache.spark.sql.{DataFrame, Encoders, Row}

import java.io.ByteArrayOutputStream
import java.nio.ByteBuffer

/** Schema-registry Avro WIRE codec — the byte-level contract the
  * reference's producer/consumer stack speaks
  * (`/root/reference/src/Messaging/Producers/KafkaProducerManager.cs`,
  * POCO↔Avro mapping `src/Mapping/`, subject registration
  * `src/Context/KsqlContext.Schema.cs:260-281`): every key/value is the
  * Confluent framing `0x00 magic | int32-BE schema id | Avro binary
  * body`, tombstones are null-value records, and the schemas are
  * exactly [[AvroSchemaGen]]'s `{topic}-key` / `{topic}-value` output.
  *
  * No broker or registry client is needed to PIN this contract: encode
  * and decode are pure byte functions (avro-core only, on the Spark
  * classpath already), so KafkaBindingSpec round-trips and
  * golden-fixture-pins the wire bytes, and a real broker/registry swap
  * is config-only — the ids come from the registry instead of
  * [[WireSchemas]], nothing else changes.
  *
  * Scale shape: [[encodeAvro]]/[[decodeAvro]] run partition-local
  * (`mapPartitions`, writer/reader instantiated once per partition, no
  * shuffle, payloads never widen) — the same contract as the Multimodal
  * codec family.
  */
object KafkaAvroCodec {

  /** Parsed schema pair + the registry ids to frame records with.
    * Schema JSON (not parsed `Schema`) is what travels to executors —
    * `Schema` is not serializable.
    */
  final case class WireSchemas(
      keySchemaJson: String,
      valueSchemaJson: String,
      keySchemaId: Int,
      valueSchemaId: Int
  )

  def wireSchemas(m: EntityModel[_], keySchemaId: Int = 1, valueSchemaId: Int = 2): WireSchemas =
    WireSchemas(
      if (m.hasKeys) AvroSchemaGen.keySchema(m) else null,
      AvroSchemaGen.valueSchema(m),
      keySchemaId,
      valueSchemaId
    )

  /** A Kafka tombstone IS a null value (compaction delete marker). */
  val tombstone: Array[Byte] = null

  // -- Row → GenericRecord (Spark external types → Avro runtime types) --

  private def toAvro(v: Any, dt: DataType, decimal: Option[(Int, Int)]): Any =
    if (v == null) null
    else decimal match {
      case Some((_, s)) =>
        val bd = v.asInstanceOf[java.math.BigDecimal].setScale(s)
        ByteBuffer.wrap(bd.unscaledValue().toByteArray)
      case None =>
        dt match {
          case ShortType => v.asInstanceOf[Short].toInt
          case BinaryType => ByteBuffer.wrap(v.asInstanceOf[Array[Byte]])
          case d: DecimalType =>
            val bd = v.asInstanceOf[java.math.BigDecimal].setScale(d.scale)
            ByteBuffer.wrap(bd.unscaledValue().toByteArray)
          case TimestampType | TimestampNTZType =>
            val ts = v.asInstanceOf[java.sql.Timestamp]
            ts.getTime * 1000L + (ts.getNanos % 1000000L) / 1000L
          case DateType =>
            v.asInstanceOf[java.sql.Date].toLocalDate.toEpochDay.toInt
          case MapType(StringType, StringType, _) =>
            val m = new java.util.HashMap[String, String]()
            v.asInstanceOf[scala.collection.Map[String, String]]
              .foreach { case (k, x) => m.put(k, x) }
            m
          case ArrayType(et, _) =>
            val out = new java.util.ArrayList[Any]()
            // collection.Seq: Row surfaces arrays as mutable ArraySeq
            v.asInstanceOf[scala.collection.Seq[Any]].foreach(x => out.add(toAvro(x, et, None)))
            out
          case _ => v
        }
    }

  private def fromAvro(v: Any, dt: DataType, decimal: Option[(Int, Int)]): Any =
    if (v == null) null
    else decimal match {
      case Some((_, s)) =>
        val bb = v.asInstanceOf[ByteBuffer]
        val bytes = new Array[Byte](bb.remaining()); bb.duplicate().get(bytes)
        new java.math.BigDecimal(new java.math.BigInteger(bytes), s)
      case None =>
        dt match {
          case ShortType  => v.asInstanceOf[Int].toShort
          case StringType => v.toString // Utf8 → String
          case BinaryType =>
            val bb = v.asInstanceOf[ByteBuffer]
            val bytes = new Array[Byte](bb.remaining()); bb.duplicate().get(bytes)
            bytes
          case d: DecimalType => fromAvro(v, BinaryType, Some((d.precision, d.scale)))
          case TimestampType | TimestampNTZType =>
            val micros = v.asInstanceOf[Long]
            val ts = new java.sql.Timestamp(Math.floorDiv(micros, 1000L))
            ts.setNanos((Math.floorMod(micros, 1000000L) * 1000L).toInt)
            ts
          case DateType =>
            java.sql.Date.valueOf(java.time.LocalDate.ofEpochDay(v.asInstanceOf[Int].toLong))
          case MapType(StringType, StringType, _) =>
            import scala.jdk.CollectionConverters._
            v.asInstanceOf[java.util.Map[Any, Any]].asScala
              .map { case (k, x) => k.toString -> (if (x == null) null else x.toString) }
              .toMap
          case ArrayType(et, _) =>
            import scala.jdk.CollectionConverters._
            v.asInstanceOf[java.util.List[Any]].asScala.toSeq.map(fromAvro(_, et, None))
          case _ => v
        }
    }

  /** One reusable serializer for a (schema, id) pair — instantiate once
    * per partition, not per row.
    */
  final class Serde(schemaJson: String, schemaId: Int) extends Serializable {
    @transient private lazy val schema = new Schema.Parser().parse(schemaJson)
    @transient private lazy val writer = new GenericDatumWriter[GenericRecord](schema)
    @transient private lazy val reader = new GenericDatumReader[GenericRecord](schema)

    def fields: Seq[Schema.Field] = {
      import scala.jdk.CollectionConverters._
      schema.getFields.asScala.toSeq
    }

    def encode(rec: GenericRecord): Array[Byte] = {
      val out = new ByteArrayOutputStream()
      // Confluent wire framing: magic 0 + int32-BE registry schema id
      out.write(0)
      out.write((schemaId >>> 24) & 0xff); out.write((schemaId >>> 16) & 0xff)
      out.write((schemaId >>> 8) & 0xff); out.write(schemaId & 0xff)
      val enc = EncoderFactory.get().binaryEncoder(out, null)
      writer.write(rec, enc)
      enc.flush()
      out.toByteArray
    }

    def decode(wire: Array[Byte]): GenericRecord = {
      require(wire(0) == 0, s"bad magic byte ${wire(0)} (not Confluent wire format)")
      val id = ((wire(1) & 0xff) << 24) | ((wire(2) & 0xff) << 16) |
        ((wire(3) & 0xff) << 8) | (wire(4) & 0xff)
      require(id == schemaId, s"schema id $id != expected $schemaId (registry drift)")
      val dec = DecoderFactory.get().binaryDecoder(wire, 5, wire.length - 5, null)
      reader.read(null, dec)
    }

    def newRecord(): GenericRecord = new GenericData.Record(schema)
  }

  /** Encode one Row's columns (pre-resolved (field, index) pairs — rows
    * inside `mapPartitions` carry no schema to look names up in) as
    * wire bytes.
    */
  private def encodeRow(
      row: Row,
      cols: Seq[(StructField, Int)],
      decimals: Map[String, (Int, Int)],
      serde: Serde
  ): Array[Byte] = {
    val rec = serde.newRecord()
    cols.foreach { case (f, i) =>
      rec.put(f.name, toAvro(if (row.isNullAt(i)) null else row.get(i), f.dataType, decimals.get(f.name)))
    }
    serde.encode(rec)
  }

  /** Driver-side single-record encode/decode (the spec surface). */
  def encodeValue(m: EntityModel[_], ws: WireSchemas, row: Row): Array[Byte] = {
    val cols = m.schema.fields.filterNot(f => m.ignored.contains(f.name)).toSeq
      .map(f => f -> row.fieldIndex(f.name))
    encodeRow(row, cols, m.decimals, new Serde(ws.valueSchemaJson, ws.valueSchemaId))
  }

  def encodeKey(m: EntityModel[_], ws: WireSchemas, row: Row): Array[Byte] = {
    require(m.hasKeys, s"entity '${m.name}' has no key columns")
    val byName = m.schema.fields.map(f => f.name -> f).toMap
    encodeRow(row, m.keys.map(k => byName(k) -> row.fieldIndex(k)),
      m.decimals, new Serde(ws.keySchemaJson, ws.keySchemaId))
  }

  def decodeValue(m: EntityModel[_], ws: WireSchemas, wire: Array[Byte]): Row = {
    val cols = m.schema.fields.filterNot(f => m.ignored.contains(f.name)).toSeq
    val rec = new Serde(ws.valueSchemaJson, ws.valueSchemaId).decode(wire)
    Row.fromSeq(cols.map(f => fromAvro(rec.get(f.name), f.dataType, m.decimals.get(f.name))))
  }

  /** Encode entity rows for the Kafka sink at the wire level: `key` /
    * `value` binary columns in registry framing (the Avro twin of
    * [[KafkaBinding.encodeJson]]); a `__headers` map column rides
    * through if present. Tombstones: rows where every non-key column is
    * null encode a null value (the produce-delete convention,
    * ChangelogStore.tombstone).
    */
  def encodeAvro(df: DataFrame, m: EntityModel[_], ws: WireSchemas): DataFrame = {
    val inSchema = df.schema
    val valueCols = m.schema.fields.filterNot(f => m.ignored.contains(f.name)).toSeq
      .map(f => f -> inSchema.fieldIndex(f.name))
    val byName = m.schema.fields.map(f => f.name -> f).toMap
    val keyCols =
      if (m.hasKeys) m.keys.map(k => byName(k) -> inSchema.fieldIndex(k)) else Nil
    val decimals = m.decimals
    val hasHeaders = df.columns.contains("__headers")
    val headersIdx = if (hasHeaders) inSchema.fieldIndex("__headers") else -1
    val outFields = Seq(
      StructField("key", BinaryType),
      StructField("value", BinaryType)
    ) ++ (if (hasHeaders) Seq(StructField("__headers", MapType(StringType, StringType))) else Nil)
    val enc = Encoders.row(StructType(outFields))
    val (ksJson, kId, vsJson, vId) =
      (ws.keySchemaJson, ws.keySchemaId, ws.valueSchemaJson, ws.valueSchemaId)
    val keyNames = m.keys.toSet // don't drag the EntityModel (and its Encoder) into the closure
    df.mapPartitions { rows =>
      val keySerde = if (ksJson != null) new Serde(ksJson, kId) else null
      val valSerde = new Serde(vsJson, vId)
      rows.map { r =>
        val key =
          if (keySerde == null) null else encodeRow(r, keyCols, decimals, keySerde)
        val isTombstone = valueCols.forall { case (f, i) =>
          keyNames.contains(f.name) || r.isNullAt(i)
        }
        val value = if (isTombstone) null else encodeRow(r, valueCols, decimals, valSerde)
        val base = Seq(key, value)
        Row.fromSeq(if (hasHeaders) base :+ r.get(headersIdx) else base)
      }
    }(enc)
  }

  /** Decode a wire-framed `key`/`value` frame back into typed entity
    * columns (+ `__tombstone` flag; Kafka metadata columns ride through
    * when present — the [[KafkaBinding.decodeJson]] convention).
    */
  def decodeAvro(df: DataFrame, m: EntityModel[_], ws: WireSchemas): DataFrame = {
    val valueCols = m.schema.fields.filterNot(f => m.ignored.contains(f.name)).toSeq
    val valueIdx = df.schema.fieldIndex("value")
    val passThrough = df.schema.fields.zipWithIndex
      .filter { case (f, _) => f.name != "key" && f.name != "value" }.toSeq
    // a tombstone nullifies EVERY value column, so the decoded frame is
    // nullable regardless of the entity's declared nullability
    val outFields = valueCols.map(_.copy(nullable = true)) ++ passThrough.map(_._1) :+
      StructField("__tombstone", BooleanType, nullable = false)
    val decimals = m.decimals
    val enc = Encoders.row(StructType(outFields))
    val (vsJson, vId) = (ws.valueSchemaJson, ws.valueSchemaId)
    df.mapPartitions { rows =>
      val valSerde = new Serde(vsJson, vId)
      rows.map { r =>
        val wire = if (r.isNullAt(valueIdx)) null else r.getAs[Array[Byte]](valueIdx)
        val decoded: Seq[Any] =
          if (wire == null) valueCols.map(_ => null)
          else {
            val rec = valSerde.decode(wire)
            valueCols.map(f => fromAvro(rec.get(f.name), f.dataType, decimals.get(f.name)))
          }
        val extras = passThrough.map { case (_, i) => r.get(i) }
        Row.fromSeq(decoded ++ extras :+ (wire == null))
      }
    }(enc)
  }
}
