package graft

import graft.core.EntityModel
import graft.sources.{EmbeddedBroker, KafkaAvroCodec}
import graft.sources.EmbeddedBroker.ProducerRecord
import org.apache.spark.sql.Row
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** The produce → consume loop the sandbox's missing kafka jars kept
  * un-runnable until round 12: real registry-framed Avro wire bytes
  * flow through [[EmbeddedBroker]] — an in-JVM implementation of the
  * Kafka storage contract (murmur2 default partitioner, offset-ordered
  * partition logs, tombstones, compaction, headers, restart
  * persistence) — and come back byte-identical, decode to the original
  * rows, and honor every broker-side semantic the binding depends on.
  * Swapping a real broker in changes CONFIG (KafkaBinding options),
  * not code: the frames on the wire are the same ones pinned here and
  * in KafkaBindingSpec's golden fixtures.
  *
  * ref: src/Messaging/Producers/KafkaProducerManager.cs,
  * src/Messaging/Consumers/KafkaConsumerManager.cs,
  * src/Context/KsqlContext.Schema.cs:260-281 (subjects + wire framing).
  */
class KafkaLoopSpec extends SparkSpec {
  import spark.implicits._

  private val tick =
    EntityModel[WireTick]("tick").key("sym", "venue").timestamp("ts").toTopic("ticks").validated
  private val ws = KafkaAvroCodec.wireSchemas(tick, keySchemaId = 7, valueSchemaId = 9)

  private def newBroker() = {
    val dir = java.nio.file.Files.createTempDirectory("graft_broker").toString
    (dir, new EmbeddedBroker(dir))
  }

  private def ticksDf(rows: WireTick*) = rows.toDS().toDF()

  private def framesOf(df: org.apache.spark.sql.DataFrame): Seq[(Array[Byte], Array[Byte])] =
    KafkaAvroCodec.encodeAvro(df, tick, ws)
      .collect().toSeq
      .map(r => (r.getAs[Array[Byte]]("key"), r.getAs[Array[Byte]]("value")))

  test("murmur2 matches Kafka's published vectors — keyed records land where a real producer sends them") {
    // org.apache.kafka.common.utils.UtilsTest vectors, cross-checked
    // against an independent implementation of the algorithm
    def m2(s: String) = EmbeddedBroker.murmur2(s.getBytes("UTF-8"))
    assert(m2("21") == -973932308)
    assert(m2("foobar") == -790332482)
    assert(m2("a-little-bit-long-string") == -985981536)
  }

  test("wire bytes survive the full produce→consume loop byte-identically and decode to the rows") {
    val (_, broker) = newBroker()
    broker.createTopic("ticks", 3)
    val t0 = new java.sql.Timestamp(1704067200000L)
    val rows = Seq(
      WireTick("AAPL", "X", 101.5, t0),
      WireTick("MSFT", "Y", 402.25, new java.sql.Timestamp(1704067201000L)),
      WireTick("AAPL", "X", 102.0, new java.sql.Timestamp(1704067202000L))
    )
    val frames = framesOf(ticksDf(rows: _*))
    val assigned = broker.produce("ticks",
      frames.zipWithIndex.map { case ((k, v), i) => ProducerRecord(k, v, 1000L + i) })

    // same key → same partition (per-key ordering holds); partition is
    // the DefaultPartitioner's choice over the SERIALIZED key bytes
    val aaplParts = assigned.zip(rows).filter(_._2.sym == "AAPL").map(_._1._1).distinct
    assert(aaplParts.size == 1)
    val expectedPart = (EmbeddedBroker.murmur2(frames.head._1) & 0x7fffffff) % 3
    assert(aaplParts.head == expectedPart)

    // consume everything back: bytes identical to what was produced
    val consumed = (0 until 3).flatMap(p => broker.fetch("ticks", p))
    assert(consumed.size == 3)
    val byOffset = consumed.sortBy(r => (r.partition, r.offset))
    val produced = frames.map(_._2.toSeq).toSet
    assert(byOffset.map(_.value.toSeq).toSet == produced)

    // decode through the same path a kafka-source frame takes: the
    // consumer record IS the kafka source column set
    val kafkaSchema = StructType(Seq(
      StructField("key", BinaryType), StructField("value", BinaryType),
      StructField("topic", StringType), StructField("partition", IntegerType),
      StructField("offset", LongType), StructField("timestamp", LongType)))
    val raw = spark.createDataFrame(
      spark.sparkContext.parallelize(consumed.map(c =>
        Row(c.key, c.value, c.topic, c.partition, c.offset, c.timestamp))),
      kafkaSchema)
    val decoded = KafkaAvroCodec.decodeAvro(raw, tick, ws)
    val back = decoded
      .filter(!col("__tombstone"))
      .select("sym", "venue", "px", "ts").as[WireTick].collect().toSet
    assert(back == rows.toSet)
    // kafka metadata rode through
    assert(decoded.select("topic").distinct().as[String].collect().toSeq == Seq("ticks"))
  }

  test("offset resume: a consumer continues from its last position, not from zero") {
    val (_, broker) = newBroker()
    broker.createTopic("ticks", 1)
    val t = new java.sql.Timestamp(1704067200000L)
    def produceOne(px: Double) = broker.produce("ticks",
      framesOf(ticksDf(WireTick("A", "X", px, t))).map { case (k, v) => ProducerRecord(k, v, 1L) })
    produceOne(1.0); produceOne(2.0)
    val pos = broker.endOffset("ticks", 0)
    assert(pos == 2L)
    produceOne(3.0); produceOne(4.0)
    val newOnly = broker.fetch("ticks", 0, fromOffset = pos)
    assert(newOnly.map(_.offset) == Seq(2L, 3L))
    assert(newOnly.forall(_.value != null))
  }

  test("tombstone + compaction: deleted key vanishes, survivors keep their offsets") {
    val (_, broker) = newBroker()
    broker.createTopic("ticks", 1)
    val t = new java.sql.Timestamp(1704067200000L)
    val df = ticksDf(
      WireTick("A", "X", 1.0, t),
      WireTick("B", "Y", 2.0, t),
      WireTick("A", "X", 3.0, t))
    val frames = framesOf(df)
    // tombstone for A: the key's frame with a null value
    val all = frames.map { case (k, v) => ProducerRecord(k, v, 1L) } :+
      ProducerRecord(frames.head._1, KafkaAvroCodec.tombstone, 2L)
    broker.produce("ticks", all)

    broker.compact("ticks", retainTombstones = true)
    val withMarker = broker.fetch("ticks", 0)
    // newest-per-key: B's record + A's tombstone survive; offsets intact
    assert(withMarker.map(_.offset) == Seq(1L, 3L))
    assert(withMarker.last.value == null)

    broker.compact("ticks", retainTombstones = false)
    val done = broker.fetch("ticks", 0)
    assert(done.map(_.offset) == Seq(1L))
    val rec = KafkaAvroCodec.decodeValue(tick, ws, done.head.value)
    assert(rec.getAs[String](0) == "B" && rec.getAs[Double](2) == 2.0)
  }

  test("headers ride the wire; the log survives a broker restart") {
    val (dir, broker) = newBroker()
    broker.createTopic("ticks", 2)
    val t = new java.sql.Timestamp(1704067200000L)
    val frames = framesOf(ticksDf(WireTick("A", "X", 1.0, t)))
    broker.produce("ticks", frames.map { case (k, v) =>
      ProducerRecord(k, v, 5L, headers = Seq("trace" -> "abc".getBytes("UTF-8")))
    })
    val again = new EmbeddedBroker(dir) // restart onto the same log dir
    val rec = (0 until again.partitionsOf("ticks")).flatMap(p => again.fetch("ticks", p))
    assert(rec.size == 1)
    assert(rec.head.timestamp == 5L)
    assert(rec.head.headers.map { case (k, v) => k -> new String(v, "UTF-8") } ==
      Seq("trace" -> "abc"))
    assert(rec.head.value.toSeq == frames.head._2.toSeq)
  }
}
