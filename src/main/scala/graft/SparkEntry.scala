package graft

import graft.queries._
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType
import org.apache.spark.sql.{DataFrame, SparkSession}

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  *
  * `queries` is the operator inventory of SURVEY §2 re-expressed
  * Spark-first; each entry has a DuckDB oracle in [[oracleSql]] unless
  * the operator is not SQL-expressible. Implementations live in
  * `graft.queries.*` (relational core / scalar functions / windows) and
  * `graft.operators.*` (LLM-data-pipeline operators).
  */
object SparkEntry {

  private val packs: Seq[QueryPack] =
    Seq(RelationalQueries, FunctionQueries, WindowQueries, PipelineQueries, GraphQueries, SelectionQueries)

  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0. */
  def entry(spark: SparkSession): DataFrame =
    queries("q_groupby_agg")(spark, "/root/testdata/sf0.001")

  /** One entry per implemented operator from SURVEY.md §2. Every entry is
    * oracle-gated by the driver (DuckDB compare) or rows-only checked.
    */
  def queries: Map[String, (SparkSession, String) => DataFrame] =
    packs.map(_.defs).reduce(_ ++ _)

  /** [[queries]] plus bench-only production-hash twins (no DuckDB mirror;
    * value identity spec-pinned). Timed by `graft.Bench`, excluded from
    * `graft.Verify`'s oracle dump.
    */
  def benchQueries: Map[String, (SparkSession, String) => DataFrame] =
    queries ++ packs.map(_.benchDefs).reduce(_ ++ _)

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omit for non-SQL-expressible ops.
    */
  def oracleSql: Map[String, String] =
    packs.map(_.oracles).reduce(_ ++ _)
}
