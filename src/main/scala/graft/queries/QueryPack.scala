package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}

/** A named group of driver-checkable queries: each entry pairs the Spark
  * implementation with an equivalent ANSI SQL oracle the driver runs in
  * DuckDB over the same parquet tables (see SparkEntry contract).
  *
  * Oracle-match conventions (the driver hash-compares values after
  * sorting columns by name):
  *   - identical output column names on both sides;
  *   - double aggregations go through DECIMAL so the result is
  *     summation-order independent, then back to DOUBLE;
  *   - libm-dependent functions (sin/exp/pow...) are rounded;
  *   - every query carries a deterministic ORDER BY.
  */
trait QueryPack {
  def defs: Map[String, (SparkSession, String) => DataFrame]
  def oracles: Map[String, String]

  /** Bench-only queries: run and timed by `graft.Bench`, excluded from the
    * driver's oracle gate (`graft.Verify`). For production-hash variants of
    * oracle-green queries (xxhash64 has no DuckDB mirror) whose value
    * identity is spec-pinned instead.
    */
  def benchDefs: Map[String, (SparkSession, String) => DataFrame] = Map.empty
}
