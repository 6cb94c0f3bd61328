package graft

import graft.core.EntityModel
import graft.sources.KafkaBinding
import graft.sources.KafkaBinding.KafkaOptions
import org.apache.spark.sql.functions._

case class WireTick(sym: String, venue: String, px: Double, ts: java.sql.Timestamp)

/** Topic-bound entity wiring: source/sink option assembly, subject
  * names, and the wire-schema encode/decode round trip — everything the
  * kafka jar doesn't need to be present for. `load()`/`start()` run only
  * on clusters with spark-sql-kafka on the classpath.
  */
class KafkaBindingSpec extends SparkSpec {
  import spark.implicits._

  private val tick =
    EntityModel[WireTick]("tick").key("sym", "venue").timestamp("ts").toTopic("ticks", 12, 3).validated
  private val opts = KafkaOptions(
    bootstrapServers = "broker1:9092,broker2:9092",
    startingOffsets = "earliest",
    maxOffsetsPerTrigger = Some(500000L)
  )

  test("source options bind subscribe/offsets/backpressure from entity + options") {
    val src = KafkaBinding.sourceOptions(tick, opts)
    assert(src("subscribe") == "ticks")
    assert(src("kafka.bootstrap.servers") == "broker1:9092,broker2:9092")
    assert(src("startingOffsets") == "earliest")
    assert(src("maxOffsetsPerTrigger") == "500000")
    assert(src("failOnDataLoss") == "true")
    // unbound entity fails fast
    intercept[IllegalArgumentException] {
      KafkaBinding.sourceOptions(EntityModel[WireTick]("loose"), opts)
    }
    // reader assembles without a kafka jar (load() deferred)
    KafkaBinding.reader(spark, tick, opts)
  }

  test("sink options carry topic + per-entity checkpoint; subjects follow the registry convention") {
    val sink = KafkaBinding.sinkOptions(tick, opts, "/chk")
    assert(sink("topic") == "ticks")
    assert(sink("checkpointLocation") == "/chk/tick")
    assert(KafkaBinding.subjects(tick) == ("ticks-key", "ticks-value"))
  }

  test("encode/decode round-trips rows through the wire schema") {
    val rows = Seq(
      WireTick("AAPL", "X", 101.5, java.sql.Timestamp.valueOf("2024-01-01 10:00:00")),
      WireTick("MSFT", "Y", 402.25, java.sql.Timestamp.valueOf("2024-01-01 10:00:01"))
    ).toDS()
    val encoded = KafkaBinding.encodeJson(rows.toDF(), tick)
    assert(encoded.columns.toSeq == Seq("key", "value"))
    // composite key is the NUL-joined string parts
    val k = new String(encoded.orderBy(col("key")).head.getAs[Array[Byte]]("key"), "UTF-8")
    assert(k == "AAPL\u0000X")

    // fake the kafka source frame shape around the encoded records
    val raw = encoded
      .withColumn("topic", lit("ticks"))
      .withColumn("partition", lit(3))
      .withColumn("offset", monotonically_increasing_id())
      .withColumn("timestamp", current_timestamp())
    val decoded = KafkaBinding.decodeJson(raw, tick)
    assert(
      decoded.columns.toSeq ==
        Seq("sym", "venue", "px", "ts", "__topic", "__partition", "__offset", "__ts")
    )
    val back = decoded.select("sym", "venue", "px", "ts").as[WireTick].collect().toSet
    assert(back == rows.collect().toSet)
    assert(decoded.select("__topic").head.getString(0) == "ticks")
  }
}
