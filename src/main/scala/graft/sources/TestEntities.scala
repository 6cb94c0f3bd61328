package graft.sources

import graft.core.EntityModel
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

// Typed entities over the driver testdata (TESTDATA.md). Case classes play
// the role of the reference's POCOs; EntityModel the role of its
// attribute-driven EntityModel (keys / time column / stream-table kind).
case class Lineitem(
    l_orderkey: Long, l_partkey: Long, l_suppkey: Long, l_linenumber: Int,
    l_quantity: Double, l_extendedprice: Double, l_discount: Double,
    l_tax: Double, l_returnflag: String, l_linestatus: String,
    l_shipdate: java.sql.Timestamp)
case class Order(
    o_orderkey: Long, o_custkey: Long, o_orderstatus: String,
    o_totalprice: Double, o_orderdate: java.sql.Timestamp,
    o_orderpriority: String)
case class Customer(
    c_custkey: Long, c_name: String, c_nationkey: Int, c_acctbal: Double,
    c_mktsegment: String)
case class Supplier(s_suppkey: Long, s_name: String, s_nationkey: Int, s_acctbal: Double)
case class Part(
    p_partkey: Long, p_name: String, p_brand: String, p_type: String,
    p_size: Int, p_retailprice: Double)
case class Nation(n_nationkey: Int, n_name: String, n_regionkey: Int)
case class Region(r_regionkey: Int, r_name: String)
case class Event(
    event_id: Long, ts: java.sql.Timestamp, user_id: Long,
    event_type: String, value: Double, props: String)
case class Document(doc_id: Long, text: String, lang: String, source: String, n_chars: Long)
case class Embedding(vec_id: Long, embedding: Array[Float], label: Int)
case class ScheduleRow(
    event_type: String, day: java.sql.Date,
    open_ts: java.sql.Timestamp, close_ts: java.sql.Timestamp)

/** Entity registry + planner catalog for the testdata tables. */
object TestEntities {
  val lineitem: EntityModel[Lineitem] =
    EntityModel[Lineitem]("lineitem").key("l_orderkey", "l_linenumber")
      .timestamp("l_shipdate").validated
  val orders: EntityModel[Order] =
    EntityModel[Order]("orders").key("o_orderkey").timestamp("o_orderdate").validated
  val customer: EntityModel[Customer] =
    EntityModel[Customer]("customer").key("c_custkey").asTable.validated
  val supplier: EntityModel[Supplier] =
    EntityModel[Supplier]("supplier").key("s_suppkey").asTable.validated
  val part: EntityModel[Part] =
    EntityModel[Part]("part").key("p_partkey").asTable.validated
  val nation: EntityModel[Nation] =
    EntityModel[Nation]("nation").key("n_nationkey").asTable.validated
  val region: EntityModel[Region] =
    EntityModel[Region]("region").key("r_regionkey").asTable.validated
  val events: EntityModel[Event] =
    EntityModel[Event]("events").key("event_id").timestamp("ts").validated
  // second handle onto the same stream for self-joins (the planner
  // addresses sources by entity name, so a self-join needs two names)
  val events2: EntityModel[Event] =
    EntityModel[Event]("events2").key("event_id").timestamp("ts").validated
  val documents: EntityModel[Document] =
    EntityModel[Document]("documents").key("doc_id").asTable.validated
  val embeddings: EntityModel[Embedding] =
    EntityModel[Embedding]("embeddings").key("vec_id").asTable.validated

  val marketScheduleEntity: EntityModel[ScheduleRow] =
    EntityModel[ScheduleRow]("market_schedule").key("event_type", "day").asTable.validated

  /** Derived market-schedule table: one session row per (event_type, day)
    * over the events span — 09:00..17:00 UTC. Stands in for the
    * reference's exchange schedule table (MarketSchedule fixture,
    * FIXTURES.md §1) since the driver testdata ships none.
    */
  def marketSchedule(spark: SparkSession, dir: String): DataFrame = {
    val ev = Tables.load(spark, dir, "events")
    ev.select(col("event_type"), to_date(col("ts")).as("day")).distinct()
      .select(
        col("event_type"),
        col("day"),
        (col("day").cast("timestamp") + expr("INTERVAL 9 HOURS")).as("open_ts"),
        (col("day").cast("timestamp") + expr("INTERVAL 17 HOURS")).as("close_ts")
      )
  }

  /** Planner catalog: entity name → batch DataFrame for a given sf dir. */
  def catalog(spark: SparkSession, dir: String): String => DataFrame = {
    case "events2"         => Tables.load(spark, dir, "events")
    case "market_schedule" => marketSchedule(spark, dir)
    case name              => Tables.load(spark, dir, name)
  }
}
