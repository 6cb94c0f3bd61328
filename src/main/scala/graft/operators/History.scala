package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Changelog → slowly-changing-dimension history (SCD type 2): turn an
  * append-only event/changelog stream into versioned validity
  * intervals — `valid_from` / `valid_to` / `version` / `is_current`
  * per business key. The reference's changelog model materializes only
  * the LATEST value per key (type 1: compaction,
  * `ref:src/Core/Abstractions/KsqlDb.cs` latest-by-offset semantics);
  * the SCD2 face is the time-travel twin a warehouse consumer joins
  * against for point-in-time enrichment (pairs with [[AsOfJoin]]).
  *
  * Scale shape: everything runs in per-key windows — ONE shuffle on
  * the business key, in-partition sorts only (no global sort, no
  * partition-less window); the optional collapse filter and the
  * interval/lead pass share the same partitioning, so Catalyst plans
  * one Exchange. At 100 TB each key's history lives in one task's sort
  * run; keys are independent, so skew is bounded by the hottest key
  * (same argument as [[AsOfJoin]]).
  */
object History {

  /** @param attrCols   the tracked dimension attributes: a new version
    *   opens when any of them changes (null-safe comparison)
    * @param tieBreak   unique-ifying order columns after `tsCol` —
    *   REQUIRED non-empty: with duplicate (key, ts) pairs an
    *   unqualified window order is partition-order dependent
    * @param collapseUnchanged drop no-op updates (consecutive rows
    *   with identical attributes extend the open interval instead of
    *   opening a new version)
    */
  def scd2(
      df: DataFrame,
      keyCols: Seq[String],
      tsCol: String,
      attrCols: Seq[String],
      tieBreak: Seq[String],
      collapseUnchanged: Boolean = true
  ): DataFrame = {
    require(keyCols.nonEmpty, "scd2 needs at least one business-key column")
    require(attrCols.nonEmpty, "scd2 needs at least one tracked attribute")
    require(tieBreak.nonEmpty, "scd2 needs a unique tie-break order column")

    val order = (tsCol +: tieBreak).map(col)
    val w = Window.partitionBy(keyCols.map(col): _*).orderBy(order: _*)

    val changes =
      if (!collapseUnchanged) df
      else collapsedChanges(df, keyCols, tsCol, attrCols, tieBreak)

    // same partition + prefix ordering as the collapse window — the
    // filter preserves both, so this plans one Exchange total
    changes
      .withColumn("valid_from", col(tsCol))
      .withColumn("valid_to", lead(col(tsCol), 1).over(w))
      // bigint: every SQL engine's ROW_NUMBER is 64-bit — keeping the
      // type aligned avoids the INTEGER/BIGINT hash drift class
      .withColumn("version", row_number().over(w).cast("long"))
      .withColumn("is_current", col("valid_to").isNull)
      .select((keyCols ++ attrCols).map(col) ++
        Seq(col("valid_from"), col("valid_to"), col("version"), col("is_current")): _*)
  }

  /** The collapse half of [[scd2]] alone: keep only the rows where the
    * tracked attributes differ (null-safely) from the key's previous
    * row — i.e. the CHANGE rows, in their original schema. The
    * incremental maintainer ([[graft.streaming.IncrementalScd2]])
    * persists exactly these.
    */
  private[graft] def collapsedChanges(
      df: DataFrame,
      keyCols: Seq[String],
      tsCol: String,
      attrCols: Seq[String],
      tieBreak: Seq[String]
  ): DataFrame = {
    val w = Window
      .partitionBy(keyCols.map(col): _*)
      .orderBy((tsCol +: tieBreak).map(col): _*)
    // first row per key: lag is null, <=> yields false → kept
    val attrs = struct(attrCols.map(col): _*)
    df.withColumn("__same", attrs <=> lag(attrs, 1).over(w))
      .filter(!col("__same"))
      .drop("__same")
  }
}
