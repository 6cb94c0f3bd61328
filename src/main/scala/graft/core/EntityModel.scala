package graft.core

import org.apache.spark.sql.types.StructType
import org.apache.spark.sql.{Encoder, Encoders}

import scala.reflect.runtime.universe.TypeTag

/** Stream vs Table classification.
  *
  * Mirrors the reference's StreamTableType (see
  * `/root/reference/src/Query/Abstractions`, and the inference rule
  * `src/Query/Dsl/KsqlQueryModel.cs:122-124`: any aggregate query is a
  * Table). In Spark terms a Stream is an append-only Dataset; a Table is
  * an upsert-by-key materialization (update-mode streaming agg or batch
  * snapshot).
  */
sealed trait StreamTableType
object StreamTableType {
  case object Stream extends StreamTableType
  case object Table extends StreamTableType
}

/** Per-entity error policy, mirroring
  * `/root/reference/src/Core/Abstractions/ErrorAction.cs:3-11`.
  */
sealed trait ErrorAction
object ErrorAction {
  case object Skip extends ErrorAction
  case object Retry extends ErrorAction
  case object Dlq extends ErrorAction
}

/** Typed entity registration: schema + key + time column + source/sink
  * config. The Spark re-expression of the reference's `EntityModel`
  * (`/root/reference/src/Core/Abstractions/EntityModel.cs:10-148`):
  * TopicName(:15) -> topic, Partitions(:30), KeyProperties(:47) -> keys,
  * TimeKey(:62) -> timeKey, ErrorAction(:120), EnableCache(:130) ->
  * materialized.
  *
  * Keys are column names (ordered — composite keys follow declaration
  * order like `[KsqlKey(order)]`,
  * `/root/reference/src/Core/Attributes/KsqlKeyAttribute.cs:6-14`).
  */
final case class EntityModel[T](
    name: String,
    encoder: Encoder[T],
    keys: Seq[String] = Nil,
    timeKey: Option[String] = None,
    topic: Option[String] = None,
    partitions: Int = 1,
    replicationFactor: Int = 1,
    retentionMs: Option[Long] = None,
    tableType: StreamTableType = StreamTableType.Stream,
    errorAction: ErrorAction = ErrorAction.Skip,
    materialized: Boolean = false,
    decimals: Map[String, (Int, Int)] = Map.empty,
    ignored: Set[String] = Set.empty
) {
  def schema: StructType = encoder.schema

  def isCompositeKey: Boolean = keys.size > 1
  def hasKeys: Boolean = keys.nonEmpty

  /** Validate declared columns exist in the schema (the reference
    * validates POCO/attribute consistency at model-build time,
    * `src/Query/Dsl/ToQueryValidator.cs:15-70`).
    */
  def validated: EntityModel[T] = {
    val cols = schema.fieldNames.toSet
    val missing =
      (keys ++ timeKey.toSeq ++ decimals.keys).filterNot(cols.contains)
    require(
      missing.isEmpty,
      s"entity '$name': declared columns not in schema: ${missing.mkString(", ")}"
    )
    this
  }

  // -- fluent builder (EntityModelBuilder analog,
  //    /root/reference/src/Core/Modeling/EntityModelBuilder.cs) --
  def key(cols: String*): EntityModel[T] = copy(keys = cols)
  def timestamp(col: String): EntityModel[T] = copy(timeKey = Some(col))
  def toTopic(t: String, parts: Int = 1, rf: Int = 1): EntityModel[T] =
    copy(topic = Some(t), partitions = parts, replicationFactor = rf)
  def retention(ms: Long): EntityModel[T] = copy(retentionMs = Some(ms))
  def asTable: EntityModel[T] = copy(tableType = StreamTableType.Table)
  def onError(a: ErrorAction): EntityModel[T] = copy(errorAction = a)
  def cached: EntityModel[T] = copy(materialized = true)
  def decimal(col: String, precision: Int, scale: Int): EntityModel[T] =
    copy(decimals = decimals + (col -> (precision, scale)))
  def ignore(cols: String*): EntityModel[T] = copy(ignored = ignored ++ cols)
}

object EntityModel {

  /** `entity[Rate]("rate")` — case-class schema via the product encoder. */
  def apply[T <: Product: TypeTag](name: String): EntityModel[T] =
    EntityModel(name, Encoders.product[T])
}
