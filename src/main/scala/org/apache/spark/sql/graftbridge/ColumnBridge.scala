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

  private val ckptPlanSeq = new java.util.concurrent.atomic.AtomicInteger

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

  /** Column → catalyst Expression via the full ColumnNode converter.
    * `ExpressionUtils.expression` only unwraps `ExpressionColumnNode`s;
    * a *composed* Column (e.g. `get_json_object(...)`) stays a
    * `ColumnNodeExpression`, which Dataset analysis converts but the
    * SQL `FunctionRegistry` builder path never does — it reaches
    * codegen unevaluable. This runs the same converter Dataset
    * analysis uses, yielding catalyst `UnresolvedFunction`s the
    * analyzer resolves normally.
    */
  def catalystExpression(
      c: Column
  ): org.apache.spark.sql.catalyst.expressions.Expression =
    org.apache.spark.sql.classic.ColumnNodeToExpressionConverter(c.node)

  /** Release the blocks behind a `localCheckpoint()`ed DataFrame.
    * `Dataset.unpersist` only reaches cache-manager entries; a local
    * checkpoint lives as a persisted RDD inside a `LogicalRDD` leaf,
    * which otherwise stays pinned until the ContextCleaner notices the
    * RDD is unreachable (GC-timing dependent). Iterative drivers (label
    * propagation) call this when a round's frame is superseded.
    */
  def unpersistLocalCheckpoint(df: org.apache.spark.sql.DataFrame): Unit =
    df.queryExecution.analyzed.foreach {
      case lr: org.apache.spark.sql.execution.LogicalRDD =>
        lr.rdd.unpersist(blocking = false)
      case _ =>
    }

  /** `localCheckpoint()` that PRESERVES the executed plan's output
    * partitioning (r19 optimization round). `Dataset.localCheckpoint`
    * under AQE wraps the query in `AdaptiveSparkPlanExec`, whose
    * `outputPartitioning` is `UnknownPartitioning` — so every iterative
    * operator that checkpoints per round (PageRank, HyperBall, label
    * propagation) forgets its rank frame is already hash-partitioned on
    * the join key and re-exchanges it TWICE per round (contribution
    * join + join-back). This reads the partitioning off the FINAL
    * adaptive plan after execution and rebuilds the `LogicalRDD` leaf
    * with it.
    *
    * Correctness guard: only an EXACT `HashPartitioning` whose
    * expressions all resolve in the output is carried (mapped
    * positionally from the physical output attributes to the logical
    * ones). Anything else — AQE-coalesced partitionings, range
    * partitionings, collections — falls back to `UnknownPartitioning`,
    * i.e. exactly the stock `localCheckpoint` behavior. A coalesced
    * hash partitioning in particular must NOT be re-declared as plain
    * hash: merged partitions keep co-location of equal keys but break
    * the `index = hash % n` contract co-partitioned joins rely on.
    */
  def localCheckpointKeepPartitioning(df: org.apache.spark.sql.DataFrame): org.apache.spark.sql.DataFrame = {
    import org.apache.spark.sql.catalyst.expressions.{Attribute, AttributeMap}
    import org.apache.spark.sql.catalyst.plans.physical.{HashPartitioning, UnknownPartitioning}
    import org.apache.spark.sql.execution.LogicalRDD
    import org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec
    val ds = df.asInstanceOf[org.apache.spark.sql.classic.Dataset[org.apache.spark.sql.Row]]
    val session = ds.sparkSession
    val qe = ds.queryExecution
    val physical = qe.executedPlan
    val internalRdd = physical.execute().map(_.copy())
    internalRdd.localCheckpoint()
    internalRdd.count() // eager, like localCheckpoint(eager = true)
    val finalPlan = physical match {
      case a: AdaptiveSparkPlanExec => a.executedPlan
      case p                        => p
    }
    // SPARK_GRAFT_DUMP_CKPT_PLANS=<dir>: write each checkpointed
    // query's EXECUTED plan to a numbered file — the per-round loop
    // plans a final explain() can't show (measurement hook, r19)
    sys.env.get("SPARK_GRAFT_DUMP_CKPT_PLANS").foreach { dir =>
      java.nio.file.Files.createDirectories(java.nio.file.Paths.get(dir))
      val i = ckptPlanSeq.incrementAndGet()
      java.nio.file.Files.write(
        java.nio.file.Paths.get(dir, f"ckpt_$i%03d.txt"),
        finalPlan.toString.getBytes("UTF-8"))
    }
    val logicalOut = qe.analyzed.output
    // physical output attrs normally keep the logical exprIds, but map
    // positionally to be safe
    val attrMap = AttributeMap(finalPlan.output.zip(logicalOut))
    // SPARK_GRAFT_CKPT_KEEP=0 reverts to the stock localCheckpoint
    // behavior (UnknownPartitioning) — the A/B switch for measuring
    // what the carried partitioning is worth
    val keep = !sys.env.get("SPARK_GRAFT_CKPT_KEEP").contains("0")
    val partitioning = finalPlan.outputPartitioning match {
      case hp: HashPartitioning
          if keep && hp.getClass == classOf[HashPartitioning] &&
            hp.references.subsetOf(finalPlan.outputSet) =>
        hp.copy(expressions = hp.expressions.map(_.transform {
          case a: Attribute => attrMap.getOrElse(a, a)
        }))
      case _ => UnknownPartitioning(internalRdd.getNumPartitions)
    }
    org.apache.spark.sql.classic.Dataset.ofRows(
      session,
      LogicalRDD(logicalOut, internalRdd, partitioning, Nil, false, None)(session, None, None))
  }

  /** Apply an extensions injector's `injectFunction` registrations to a
    * live session — the same `registerFunctions` call session
    * construction runs on `BaseSessionStateBuilder.functionRegistry`.
    * Exists because `getOrCreate` returns a pre-existing session
    * without applying `withExtensions`, and the extensions-carrying
    * SparkSession constructor is fully private: tests of an injector
    * (e.g. `graft.GraftExtensions`) exercise the inject path here.
    */
  def applyInjectedFunctions(
      configure: org.apache.spark.sql.SparkSessionExtensions => Unit,
      spark: org.apache.spark.sql.SparkSession
  ): Unit = {
    val ext = new org.apache.spark.sql.SparkSessionExtensions
    configure(ext)
    ext.registerFunctions(spark.sessionState.functionRegistry)
  }
}
