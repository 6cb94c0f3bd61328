package org.apache.spark.sql.graftbridge

import org.apache.spark.sql.Column
import org.apache.spark.sql.internal.UnresolvedFunction

/** Introspection over unresolved Column trees. Spark 4 removed the
  * public `Column.expr`; the ColumnNode tree (sql-api internal) is the
  * pre-analysis representation, and `collect` traverses it recursively.
  * Lives under `org.apache.spark.sql` to keep all internal-API use in
  * one sanctioned place.
  */
object ColumnBridge {

  /** Every function name referenced anywhere in the column's tree. */
  def functionNames(c: Column): Seq[String] =
    c.node.collect { case f: UnresolvedFunction => f.functionName }

  /** Wrap a catalyst Expression as a user-facing Column (for custom
    * expressions like [[graft.functions.CosineSimilarity]]).
    */
  def column(e: org.apache.spark.sql.catalyst.expressions.Expression): Column =
    org.apache.spark.sql.classic.ExpressionUtils.column(e)

  /** Column → catalyst Expression (unresolved). */
  def expression(c: Column): org.apache.spark.sql.catalyst.expressions.Expression =
    org.apache.spark.sql.classic.ExpressionUtils.expression(c)
}
