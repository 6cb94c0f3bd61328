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
}
