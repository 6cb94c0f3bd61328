package graft.plans

import graft.core.EntityModel
import org.apache.spark.sql.types._

/** Projection ↔ target-entity validation — parity with the reference's
  * `ToQueryValidator` (`/root/reference/src/Query/Dsl/ToQueryValidator.cs:15-70`):
  * a derived entity's SELECT must match the target POCO by name, order
  * and type, with decimal precision/scale checked against the entity's
  * declared `[KsqlDecimal]` config; the `WindowStart`/`WindowEnd`
  * pseudo-columns of windowed records are excluded from matching
  * (`:23-31`).
  */
object ToQueryValidator {

  val WindowCols: Set[String] = Set("window_start", "window_end")

  final case class ValidationError(msg: String) extends IllegalArgumentException(msg)

  /** Validate a planned projection schema against the target entity. */
  def validate(planned: StructType, target: EntityModel[_]): Unit = {
    val expected = target.schema.fields.filterNot(f => target.ignored.contains(f.name))
    val actual = planned.fields.filterNot(f => WindowCols.contains(f.name.toLowerCase))

    if (actual.length != expected.length)
      throw ValidationError(
        s"projection has ${actual.length} columns but entity '${target.name}' expects " +
          s"${expected.length} (${expected.map(_.name).mkString(", ")})"
      )
    expected.zip(actual).foreach { case (e, a) =>
      if (!e.name.equalsIgnoreCase(a.name))
        throw ValidationError(
          s"projection column '${a.name}' does not match entity column '${e.name}' " +
            "(order and names must match)"
        )
      (declaredType(target, e), a.dataType) match {
        case (d: DecimalType, ad: DecimalType) =>
          val (p, s, ap, as) = (d.precision, d.scale, ad.precision, ad.scale)
          if (p != ap || s != as)
            throw ValidationError(
              s"column '${e.name}': decimal precision/scale ($ap,$as) does not match " +
                s"declared ($p,$s)"
            )
        case (et, at) if !compatible(et, at) =>
          throw ValidationError(
            s"column '${e.name}': type ${at.sql} does not match entity type ${et.sql}"
          )
        case _ =>
      }
    }
  }

  private def declaredType(target: EntityModel[_], f: StructField): DataType =
    target.decimals.get(f.name) match {
      case Some((p, s)) => DecimalType(p, s)
      case None         => f.dataType
    }

  private def compatible(expected: DataType, actual: DataType): Boolean =
    (expected, actual) match {
      case (a, b) if a == b                        => true
      case (LongType, IntegerType)                 => true // widening is safe
      case (DoubleType, FloatType)                 => true
      case (_: DecimalType, _: DecimalType)        => true // precision checked above
      // the engine pins the session to UTC, so NTZ and LTZ timestamps
      // denote the same instants (parquet scans infer NTZ in Spark 4)
      case (TimestampType, TimestampNTZType)       => true
      case (TimestampNTZType, TimestampType)       => true
      case _                                       => false
    }
}
