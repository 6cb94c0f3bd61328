package graft.sources

import graft.core.EntityModel
import org.apache.spark.sql.types._

/** Avro schema generation from an entity model — parity with the
  * reference's Mapping module (`/root/reference/src/Mapping/` generates
  * Avro key/value schemas from the POCO; subjects `{topic}-key` /
  * `{topic}-value` are registered at startup,
  * `KsqlContext.Schema.cs:260-281`).
  *
  * Pure string generation against the Avro 1.x spec (no library dep):
  * the VALUE record carries every non-ignored column, the KEY record
  * only the key columns, both nullable-union-typed like Avro-serialized
  * Kafka payloads. Decimal columns use the standard `bytes` +
  * logicalType decimal encoding with the entity's declared precision.
  */
object AvroSchemaGen {

  def valueSchema(m: EntityModel[_]): String = {
    val fields = m.schema.fields
      .filterNot(f => m.ignored.contains(f.name))
      .map(f => fieldJson(m, f))
    record(s"${m.name}_value", fields.toIndexedSeq)
  }

  def keySchema(m: EntityModel[_]): String = {
    require(m.hasKeys, s"entity '${m.name}' has no key columns")
    val byName = m.schema.fields.map(f => f.name -> f).toMap
    record(s"${m.name}_key", m.keys.map(k => fieldJson(m, byName(k))))
  }

  /** Subject names, `{topic}-key` / `{topic}-value`. */
  def subjects(m: EntityModel[_]): (String, String) = {
    val topic = m.topic.getOrElse(m.name)
    (s"$topic-key", s"$topic-value")
  }

  private def record(name: String, fields: Seq[String]): String =
    s"""{"type":"record","name":"$name","fields":[${fields.mkString(",")}]}"""

  private def fieldJson(m: EntityModel[_], f: StructField): String = {
    val avro = avroType(m, f)
    val t = if (f.nullable) s"""["null",$avro]""" else avro
    s"""{"name":"${f.name}","type":$t}"""
  }

  private def avroType(m: EntityModel[_], f: StructField): String =
    m.decimals.get(f.name) match {
      case Some((p, s)) =>
        s"""{"type":"bytes","logicalType":"decimal","precision":$p,"scale":$s}"""
      case None =>
        f.dataType match {
          case IntegerType | ShortType          => "\"int\""
          case LongType                         => "\"long\""
          case FloatType                        => "\"float\""
          case DoubleType                       => "\"double\""
          case StringType                       => "\"string\""
          case BooleanType                      => "\"boolean\""
          case BinaryType                       => "\"bytes\""
          case TimestampType | TimestampNTZType =>
            """{"type":"long","logicalType":"timestamp-micros"}"""
          case DateType                         => """{"type":"int","logicalType":"date"}"""
          case d: DecimalType =>
            s"""{"type":"bytes","logicalType":"decimal","precision":${d.precision},"scale":${d.scale}}"""
          case MapType(StringType, StringType, _) =>
            """{"type":"map","values":"string"}"""
          case ArrayType(et, _) =>
            val inner = avroType(m, StructField(f.name, et))
            s"""{"type":"array","items":$inner}"""
          case other =>
            throw new IllegalArgumentException(
              s"column '${f.name}': type ${other.sql} is not supported for Avro mapping " +
                "(the reference supports flat schemas + MAP<STRING,STRING> only)"
            )
        }
    }
}
