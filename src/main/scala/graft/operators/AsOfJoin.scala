package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** As-of (point-in-time) join: for every left row, the single latest
  * right row with `right.ts <= left.ts` on the same key — the rates /
  * mark-to-market enrichment the reference's WITHIN join cannot express
  * (WITHIN is symmetric-banded, `ref:src/Query/Dsl/KsqlQueryable.cs:
  * 48-67`; as-of is one-sided latest-wins).
  *
  * Spark has no native as-of join, and the naive form —
  * `l JOIN r ON key AND r.ts <= l.ts` + keep-latest — is a range join
  * that degenerates to per-key cross products (a hot key with n lefts ×
  * m rights ships n·m rows before pruning). This implementation is the
  * scale-correct UNION-SCAN shape: tag both sides, ONE shuffle on the
  * key, one in-partition sort by (ts, side), then carry the most recent
  * right payload forward with `last(..., ignoreNulls)` — O(n+m) rows
  * shuffled, zero join blow-up, and Catalyst plans it as a single
  * Window over Exchange. Tie rules: a right row at exactly left.ts wins
  * (right sorts before left on equal ts), matching DuckDB/kdb ASOF; and
  * DUPLICATE right rows at the same (key, ts) resolve deterministically
  * to the GREATEST payload struct (field-wise comparison over
  * (matched right ts, payload...), i.e. SQL `max(struct)`) — without
  * that sort key the winner would be partition-order dependent and
  * could differ run to run. When the payload contains a non-orderable
  * type (a map column), the tie-break cannot apply and uniqueness of
  * right rows per (key, ts) becomes a caller precondition.
  *
  * At 100 TB the per-key history lives in ONE task's sort run; keys are
  * independent, so skew is bounded by the hottest single key (salt the
  * fact side upstream if one key dominates; see `Skew`).
  */
object AsOfJoin {

  /** @param rightPayload right columns to carry onto matched left rows
    *   (rename on `right` beforehand if they collide with left names —
    *   asserted here). Unmatched lefts keep them null (LEFT as-of).
    * @param toleranceSeconds optional max staleness: a match older than
    *   `left.ts - tolerance` is discarded (row kept, payload nulled).
    */
  def asOf(
      left: DataFrame,
      right: DataFrame,
      keyCols: Seq[String],
      leftTs: String,
      rightTs: String,
      rightPayload: Seq[String],
      toleranceSeconds: Option[Long] = None
  ): DataFrame = {
    val collisions = rightPayload.toSet.intersect(left.columns.toSet)
    require(collisions.isEmpty, s"rename right payload columns colliding with left: $collisions")

    // payload struct carries the matched right event time for the
    // tolerance gate (and so ties within the right side stay atomic)
    val payload = struct(col(rightTs).cast("timestamp").as("__rts") +: rightPayload.map(col): _*)
    val r = right.select(
      keyCols.map(col) ++
        Seq(col(rightTs).cast("timestamp").as("__ts"), lit(0).as("__side"), payload.as("__p")): _*)

    val leftRest = left.schema.filterNot(f => keyCols.contains(f.name))
    val l = left.select(
      keyCols.map(col) ++ leftRest.map(f => col(f.name)) ++
        Seq(col(leftTs).cast("timestamp").as("__ts"), lit(1).as("__side"),
          lit(null).cast(r.schema("__p").dataType).as("__p")): _*)
    val rAligned = r.select(
      keyCols.map(col) ++ leftRest.map(f => lit(null).cast(f.dataType).as(f.name)) ++
        Seq(col("__ts"), col("__side"), col("__p")): _*)

    // deterministic tie-break among duplicate rights at one (key, ts):
    // ascending payload struct puts the greatest last, so `last()` picks
    // it. Skipped (precondition instead) for non-orderable payloads.
    val tieBreak =
      if (org.apache.spark.sql.catalyst.expressions.RowOrdering
          .isOrderable(r.schema("__p").dataType))
        Seq(col("__p").asc_nulls_first)
      else Seq.empty
    val w = Window
      .partitionBy(keyCols.map(col): _*)
      .orderBy(Seq(col("__ts").asc, col("__side").asc) ++ tieBreak: _*)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val matched = l.unionByName(rAligned)
      .withColumn("__m", last(col("__p"), ignoreNulls = true).over(w))
      .filter(col("__side") === 1)

    val gated = toleranceSeconds.fold(matched) { tol =>
      matched.withColumn(
        "__m",
        when(col("__m.__rts") >= col("__ts") - expr(s"INTERVAL $tol SECONDS"), col("__m")))
    }
    gated.select(
      keyCols.map(col) ++ leftRest.map(f => col(f.name)) ++
        rightPayload.map(c => col(s"__m.$c").as(c)): _*)
  }
}
