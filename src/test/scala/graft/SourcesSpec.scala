package graft

import graft.core.EntityModel
import graft.sources.{AvroSchemaGen, FormatSources}
import org.apache.spark.sql.functions._

import java.nio.file.{Files, Paths}

case class Quote(broker: String, symbol: String, price: Double)

/** JSON/CSV source formats with corrupt-record DLQ routing, and Avro
  * schema generation from entity models.
  */
class SourcesSpec extends SparkSpec {

  private val quoteEntity =
    EntityModel[Quote]("quotes").key("broker", "symbol").toTopic("quotes-topic").validated

  test("JSON source: schema-enforced read, corrupt rows routed to DLQ envelopes") {
    val dir = Files.createTempDirectory("jsonsrc")
    Files.writeString(Paths.get(dir.toString, "data.json"),
      """{"broker":"b1","symbol":"X","price":10.5}
        |{"broker":"b1","symbol":"Y","price":20.0}
        |{not valid json at all
        |""".stripMargin)
    val (good, dlq) = FormatSources.json(spark, quoteEntity, dir.toString)
    assert(good.count() == 2)
    val dlqRows = dlq.collect()
    assert(dlqRows.length == 1)
    assert(dlqRows.head.getAs[String]("source") == "quotes")
    assert(dlqRows.head.getAs[String]("raw").contains("not valid"))
  }

  test("CSV source: header read with type-mismatch rows dead-lettered") {
    val dir = Files.createTempDirectory("csvsrc")
    Files.writeString(Paths.get(dir.toString, "data.csv"),
      """broker,symbol,price
        |b1,X,10.5
        |b1,Y,not_a_number
        |""".stripMargin)
    val (good, dlq) = FormatSources.csv(spark, quoteEntity, dir.toString)
    assert(good.count() == 1)
    assert(dlq.count() == 1)
  }

  test("streaming JSON source feeds the planner") {
    val dir = Files.createTempDirectory("jsonstream")
    Files.writeString(Paths.get(dir.toString, "batch1.json"),
      """{"broker":"b1","symbol":"X","price":1.0}""" + "\n")
    val stream = FormatSources.jsonStream(spark, quoteEntity, dir.toString)
    assert(stream.isStreaming)
    val q = stream
      .filter(col(graft.streaming.ErrorSink.CorruptCol).isNull)
      .drop(graft.streaming.ErrorSink.CorruptCol)
      .writeStream.format("memory").queryName("json_stream").outputMode("append").start()
    try {
      q.processAllAvailable()
      assert(spark.table("json_stream").count() == 1)
    } finally q.stop()
  }

  test("Avro schema generation: value, key, subjects, decimal logical type") {
    val m = quoteEntity.decimal("price", 18, 4)
    val value = AvroSchemaGen.valueSchema(m)
    assert(value.contains(""""name":"quotes_value""""))
    assert(value.contains(""""name":"broker","type":["null","string"]"""))
    assert(value.contains(""""logicalType":"decimal","precision":18,"scale":4"""))
    val key = AvroSchemaGen.keySchema(m)
    assert(key.contains("broker") && key.contains("symbol") && !key.contains("price"))
    assert(AvroSchemaGen.subjects(m) == ("quotes-topic-key", "quotes-topic-value"))
    // timestamps map to timestamp-micros
    val ev = AvroSchemaGen.valueSchema(graft.sources.TestEntities.events)
    assert(ev.contains(""""logicalType":"timestamp-micros""""))
    intercept[IllegalArgumentException] {
      AvroSchemaGen.valueSchema(EntityModel[Embed2]("e"))
    }
  }
}

case class Embed2(id: Long, m: Map[String, Int]) // unsupported map value type
