package graft

import graft.core.EntityModel
import graft.plans.ToQueryValidator
import graft.plans.ToQueryValidator.ValidationError
import graft.streaming.BarCascade
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

case class BarTarget(broker: String, symbol: String, close: Double)
case class DecimalTarget(id: Long, amount: java.math.BigDecimal)

/** ToQueryValidator parity (name/order/type/decimal matching, window
  * pseudo-column stripping) + AVG decomposition re-aggregability.
  */
class ValidatorSpec extends SparkSpec {
  import spark.implicits._

  private val barEntity = EntityModel[BarTarget]("bar_target").validated

  test("matching projection validates; window pseudo-cols are stripped") {
    val planned = StructType(Seq(
      StructField("window_start", TimestampType),
      StructField("window_end", TimestampType),
      StructField("broker", StringType),
      StructField("symbol", StringType),
      StructField("close", DoubleType)
    ))
    ToQueryValidator.validate(planned, barEntity) // no throw
  }

  test("column order, name, count and type mismatches are rejected") {
    val wrongOrder = StructType(Seq(
      StructField("symbol", StringType),
      StructField("broker", StringType),
      StructField("close", DoubleType)
    ))
    intercept[ValidationError](ToQueryValidator.validate(wrongOrder, barEntity))

    val missing = StructType(Seq(StructField("broker", StringType)))
    intercept[ValidationError](ToQueryValidator.validate(missing, barEntity))

    val wrongType = StructType(Seq(
      StructField("broker", StringType),
      StructField("symbol", StringType),
      StructField("close", StringType)
    ))
    intercept[ValidationError](ToQueryValidator.validate(wrongType, barEntity))
  }

  test("decimal precision/scale is checked against the entity declaration") {
    val entity = EntityModel[DecimalTarget]("dec_target").decimal("amount", 18, 2)
    val ok = StructType(Seq(
      StructField("id", LongType),
      StructField("amount", DecimalType(18, 2))
    ))
    ToQueryValidator.validate(ok, entity)
    val bad = StructType(Seq(
      StructField("id", LongType),
      StructField("amount", DecimalType(10, 4))
    ))
    intercept[ValidationError](ToQueryValidator.validate(bad, entity))
  }

  test("decomposed AVG re-aggregates exactly; avg-of-avgs would not") {
    val rows = Seq(
      ("k", 0, 1.0), ("k", 0, 2.0), ("k", 0, 3.0), // bucket 0: avg 2.0 over 3
      ("k", 1, 10.0)                               // bucket 1: avg 10 over 1
    ).toDF("key", "bucket", "v")
    val direct = rows.groupBy($"key").agg(avg($"v")).head.getDouble(1)

    val hub = rows.groupBy($"key", $"bucket")
      .agg(BarCascade.avgDecomposed("v").head, BarCascade.avgDecomposed("v").tail: _*)
    val reagg = hub.groupBy($"key")
      .agg(BarCascade.avgReconstructed("v").head, BarCascade.avgReconstructed("v").tail: _*)
      .select(BarCascade.avgFinal("v"))
      .head.getDouble(0)
    assert(reagg == direct) // 4.0, not the naive (2.0+10.0)/2 = 6.0
  }
}
