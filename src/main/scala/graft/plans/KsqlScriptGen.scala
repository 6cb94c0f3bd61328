package graft.plans

import graft.GraftContext
import graft.core.{EntityModel, Period, StreamTableType}
import graft.dsl.QueryModel
import graft.sources.AvroSchemaGen
import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.{UnresolvedAttribute, UnresolvedFunction}
import org.apache.spark.sql.catalyst.expressions.{Alias, CaseWhen, Cast, Expression, Literal}
import org.apache.spark.sql.graftbridge.ColumnBridge
import org.apache.spark.sql.types._

/** Ordered KSQL statements generated from a context's model — the
  * reference's `KsqlScript` (`/root/reference/src/Query/Script/KsqlScript.cs:9-31`).
  */
final case class KsqlScript(statements: Seq[String]) {
  def toSql: String = statements.mkString("\n\n")
  override def toString: String = toSql
}

/** Design-time KSQL script emission — the Spark analog of the reference's
  * `DefaultKsqlScriptBuilder` (`/root/reference/src/Query/Script/DefaultKsqlScriptBuilder.cs:19-176`)
  * behind the `designtime-ksql-script` / `designtime-ksql-tumbling` examples:
  * inspect a context's entity models and emit `CREATE STREAM/TABLE` DDL for
  * base entities plus CSAS/CTAS for ToQuery-derived entities, with the same
  * WITH-clause surface (KAFKA_TOPIC, KEY_FORMAT='KAFKA'|'AVRO',
  * VALUE_FORMAT='AVRO', VALUE_AVRO_SCHEMA_FULL_NAME, TIMESTAMP, PARTITIONS,
  * REPLICAS, RETENTION_MS — `src/Query/Builders/Utilities/WithClauseBuilder.cs:36-66`).
  *
  * This is a DESIGN-TIME surface only: graft's runtime consumes Catalyst
  * plans directly (`Planner`), never KSQL text — the script exists so a
  * user migrating from a live ksqlDB deployment can diff the DDL their
  * model would have produced, and so tooling can version the topology.
  *
  * Deliberate divergence: no `GeneratedAt` timestamp line (the reference
  * stamps wall-clock time, `DefaultKsqlScriptBuilder.cs:117` — here the
  * script is byte-deterministic for a given model so it diffs cleanly
  * under version control).
  *
  * Expression rendering walks the PRE-ANALYSIS column tree (the same
  * unresolved Catalyst nodes `Dataset.select` consumes), so the rendered
  * text is exactly the query the planner will execute — there is no
  * second query AST to drift from the executed one. The function-name map
  * inverts `graft.functions.KFunctions`' Spark registrations back to
  * their KSQL names (UCASE/LEN/LATEST_BY_OFFSET/…).
  */
/** Key-column rendering style for [[KsqlScriptGen.buildStatement]] — the
  * reference's `KeyPathStyle` (`src/Query/Builders/Statements/
  * KsqlCreateStatementBuilder.cs:502-510`): `Flat` renders key columns
  * bare (the reference's `None`), `Dot` as `key.COL`, `Arrow` as
  * `KEY->COL` (ksqlDB struct-key access; the reference auto-selects
  * Arrow for tables and reserves Dot for explicit overrides).
  */
sealed abstract class KeyPathStyle
object KeyPathStyle {
  case object Flat extends KeyPathStyle
  case object Dot extends KeyPathStyle
  case object Arrow extends KeyPathStyle
}

/** Options for [[KsqlScriptGen.buildStatement]] — the reference's
  * `RenderOptions` + the `partitionBy` Build parameter
  * (`KsqlCreateStatementBuilder.cs:141-156`).
  */
final case class RenderOptions(
    keyPathStyle: KeyPathStyle = KeyPathStyle.Flat,
    partitionBy: Option[String] = None,
    // sink topic sizing — emitted into WITH only when set (the
    // reference reads them from model extras; the live-bars goldens
    // carry PARTITIONS=1, REPLICAS=1, the keypath goldens none)
    partitions: Option[Int] = None,
    replicas: Option[Int] = None,
    // the WhenEmpty live variant emits `CREATE TABLE` without
    // IF NOT EXISTS, and aliases its single source (`bar_1s_rows o`)
    ifNotExists: Boolean = true,
    sourceAlias: Option[String] = None
)

object KsqlScriptGen {

  def build(ctx: GraftContext): KsqlScript = {
    val header =
      s"-- GeneratedBy: graft ${Option(getClass.getPackage.getImplementationVersion).getOrElse("dev")}"
    val entities = ctx.entityModels
    val derived = ctx.derivedModels
    val base = entities.toSeq
      .filterNot { case (n, _) => derived.contains(n) }
      .sortBy(_._1)
      .map { case (_, m) => createBase(m) }
    val csas = derived.toSeq.sortBy(_._1).map { case (n, qm) =>
      createAs(n, qm, entities.get(n))
    }
    KsqlScript(header +: (base ++ csas))
  }

  /** Avro value schemas per entity — the `DefaultAvroSchemaExporter`
    * analog (`/root/reference/src/Query/Script/DefaultAvroSchemaExporter.cs`).
    */
  def exportValueSchemas(ctx: GraftContext): Seq[(String, String)] =
    ctx.entityModels.toSeq.sortBy(_._1).map { case (n, m) =>
      n -> AvroSchemaGen.valueSchema(m)
    }

  // ---- base-entity DDL ----------------------------------------------------

  /** `CREATE STREAM|TABLE name WITH (...);` — no column list, matching the
    * reference (`DefaultKsqlScriptBuilder.cs:171-174`: base-entity schema
    * comes from the registry subject, not inline columns).
    */
  private[graft] def createBase(m: EntityModel[_]): String = {
    val kind =
      if (m.tableType == StreamTableType.Table) "TABLE" else "STREAM"
    s"CREATE $kind ${ident(m.name)} ${withClause(m, windowed = false)};"
  }

  /** Base DDL with an INLINE column list (`name TYPE [KEY]`) — the form
    * the reference's `DerivedTumblingPipeline` emits for the 1s rows
    * stream (golden `rows_1s_stream.sql`). The schema is carried in the
    * statement, so — unlike [[createBase]] — there is no registry
    * `VALUE_AVRO_SCHEMA_FULL_NAME` entry; RETENTION_MS applies because
    * the rows stream is retention-bounded (`windowed = true`).
    */
  def createBaseWithColumns(m: EntityModel[_], windowed: Boolean = false): String = {
    val kind = if (m.tableType == StreamTableType.Table) "TABLE" else "STREAM"
    val cols = m.schema.fields.filterNot(f => m.ignored.contains(f.name)).map { f =>
      s"${ident(f.name)} ${ksqlType(f.dataType)}${if (m.keys.contains(f.name)) " KEY" else ""}"
    }.mkString("(", ", ", ")")
    val parts = Seq.newBuilder[String]
    parts += s"KAFKA_TOPIC='${m.topic.getOrElse(m.name)}'"
    if (m.hasKeys)
      parts += s"KEY_FORMAT='${if (m.isCompositeKey) "AVRO" else "KAFKA"}'"
    parts += "VALUE_FORMAT='AVRO'"
    m.timeKey.foreach(t => parts += s"TIMESTAMP='${t.toUpperCase}'")
    if (m.partitions > 0) parts += s"PARTITIONS=${m.partitions}"
    if (m.replicationFactor > 0) parts += s"REPLICAS=${m.replicationFactor}"
    m.retentionMs.filter(_ > 0 && windowed).foreach(r => parts += s"RETENTION_MS=$r")
    s"CREATE $kind IF NOT EXISTS ${ident(m.name)} $cols " +
      parts.result().mkString("WITH (", ", ", ")") + ";"
  }

  private def withClause(m: EntityModel[_], windowed: Boolean): String = {
    val parts = Seq.newBuilder[String]
    parts += s"KAFKA_TOPIC='${m.topic.getOrElse(m.name)}'"
    if (m.hasKeys)
      parts += s"KEY_FORMAT='${if (m.isCompositeKey) "AVRO" else "KAFKA"}'"
    parts += "VALUE_FORMAT='AVRO'"
    // full name = the generated value-record name (subject strategy in
    // AvroSchemaGen.subjects)
    parts += s"VALUE_AVRO_SCHEMA_FULL_NAME='graft.${m.name}_value'"
    m.timeKey.foreach(t => parts += s"TIMESTAMP='${t.toUpperCase}'")
    if (m.partitions > 0) parts += s"PARTITIONS=${m.partitions}"
    if (m.replicationFactor > 0) parts += s"REPLICAS=${m.replicationFactor}"
    // RETENTION_MS is only valid on windowed tables/streams
    // (WithClauseBuilder.cs:57-64 gates identically)
    m.retentionMs.filter(_ > 0 && windowed).foreach(r => parts += s"RETENTION_MS=$r")
    parts.result().mkString("WITH (", ", ", ")")
  }

  // ---- derived-entity CSAS/CTAS -------------------------------------------

  private[graft] def createAs(
      name: String,
      qm: QueryModel,
      sinkModel: Option[EntityModel[_]]
  ): String = {
    val isTable = qm.isAggregateQuery
    val kind = if (isTable) "TABLE" else "STREAM"
    // CTAS key = the GROUP BY key; a plain CSAS preserves the source key
    // (ksqlDB semantics: re-key only via GROUP BY / PARTITION BY). The
    // derived entity's rowtime is inherited, so no TIMESTAMP entry — the
    // reference's designtime builder passes timestampColumn: null too
    // (DefaultKsqlScriptBuilder.cs:61).
    val derivedKeys =
      if (isTable) qm.groupByNames else qm.source.keys
    val m = sinkModel.getOrElse(
      EntityModel(name, qm.source.encoder).copy(
        keys = derivedKeys,
        tableType = qm.inferredType))
    val sb = new StringBuilder
    sb ++= s"CREATE $kind IF NOT EXISTS ${ident(name)} "
    sb ++= withClause(
      m.copy(name = name, topic = m.topic.orElse(Some(name)), timeKey = None),
      windowed = qm.tumbling.nonEmpty || qm.hopping.nonEmpty)
    sb ++= " AS\n"
    val selectList =
      if (qm.select.isEmpty) "*"
      else qm.select.map(renderColumn).mkString(", ")
    sb ++= s"SELECT $selectList\n"
    sb ++= s"FROM ${ident(qm.source.name)}"
    qm.join.foreach { j =>
      val kw = if (j.joinType == "left_outer") "LEFT JOIN" else "JOIN"
      val within = j.withinSeconds.map(s => s" WITHIN $s SECONDS").getOrElse("")
      sb ++= s"\n$kw ${ident(j.right.name)}$within ON ${renderColumn(j.condition)}"
    }
    qm.tumbling.foreach { t =>
      // multi-timeframe fans out at runtime (BarCascade); design-time text
      // pins the base timeframe exactly like the reference's builder
      // (KsqlCreateWindowedStatementBuilder.cs:121-142)
      sb ++= s"\n${windowTumbling(t.timeframes.head)}"
    }
    qm.hopping.foreach { h =>
      sb ++= s"\nWINDOW HOPPING (SIZE ${h.size.toSeconds} SECONDS, ADVANCE BY ${h.advanceBy.toSeconds} SECONDS)"
    }
    if (qm.wheres.nonEmpty)
      sb ++= s"\nWHERE ${qm.wheres.map(renderColumn).mkString(" AND ")}"
    if (qm.groupBy.nonEmpty)
      sb ++= s"\nGROUP BY ${qm.groupBy.map(renderColumn).mkString(", ")}"
    qm.having.foreach(h => sb ++= s"\nHAVING ${renderColumn(h)}")
    sb ++= "\nEMIT CHANGES;"
    sb.toString
  }

  // ---- statement-level builder (key-path styles, PARTITION BY) -----------

  /** Single-statement CSAS/CTAS builder — the Spark analog of the
    * reference's `KsqlCreateStatementBuilder.Build(streamName, model,
    * options, partitionBy)` (`KsqlCreateStatementBuilder.cs:141-299`),
    * the surface behind the `keypath_*.sql` / `partition_by_variants.sql`
    * goldens. Mirrored semantics:
    *
    *   - Key-path style: key columns of the source render as `KEY->COL`
    *     (Arrow) / `key.COL` (Dot) / bare (Flat) in the SELECT and
    *     GROUP BY clauses — applied as token replacement on the rendered
    *     clause, skipping the token after `AS` so projection aliases
    *     stay bare (`ApplyKeyStyle`/`ShouldReplace`, cs:521-583).
    *   - PARTITION BY: the clause survives only on a single-source
    *     STREAM with no GROUP BY / window / EMIT FINAL whose columns do
    *     not exactly re-state the source key (cs:156-181; graft encodes
    *     EMIT FINAL via tumbling, so the window check subsumes it);
    *     qualifiers are stripped (single-source dealias), duplicates
    *     collapse with the reference's ordering — sort by normalized
    *     name, first occurrence wins (`DeduplicatePartitionColumns`,
    *     cs:641-687) — and the result merges into GROUP BY
    *     (`MergeGroupByAndPartition`, cs:690-711), which re-keys the
    *     output and therefore forces CTAS (TABLE).
    *   - Minimal WITH surface (topic + key/value formats), matching the
    *     golden statements, which carry no registry/partition extras.
    */
  def buildStatement(
      streamName: String,
      qm: QueryModel,
      options: RenderOptions = RenderOptions()
  ): String = {
    val hasGroupBy = qm.groupBy.nonEmpty
    val hasWindow = qm.tumbling.nonEmpty || qm.hopping.nonEmpty
    val sourceIsStream = qm.source.tableType != StreamTableType.Table
    val sourceKeys = qm.source.keys.map(_.toUpperCase)

    // PARTITION BY keep/drop (cs:156-181)
    val partitionRaw = options.partitionBy.toSeq
      .flatMap(_.split(",")).map(_.trim).filter(_.nonEmpty)
    val partitionUnqualified = partitionRaw.map(c => c.split('.').last.trim)
    val partitionNorm = partitionUnqualified.map(_.toUpperCase)
    val partitionMatchesKey = sourceKeys.nonEmpty &&
      partitionNorm.distinct.size == sourceKeys.size &&
      partitionNorm.forall(sourceKeys.contains)
    val keptPartition: Seq[String] =
      if (partitionRaw.nonEmpty && sourceIsStream && !hasGroupBy &&
        !hasWindow && !partitionMatchesKey)
        // dedup: sort by normalized name, first occurrence wins
        partitionUnqualified.zipWithIndex
          .groupBy(_._1.toUpperCase)
          .map { case (norm, occ) => (norm, occ.minBy(_._2)._1) }
          .toSeq
          .sortBy(_._1)
          .map { case (_, original) => ident(original) }
      else Nil

    // GROUP BY ∪ partition columns, group-by order first (cs:690-711)
    val groupRendered = qm.groupBy.map(renderColumn)
    val groupNorm = groupRendered.map(_.toUpperCase).toSet
    val mergedGroupBy =
      groupRendered ++ keptPartition.filterNot(c => groupNorm.contains(c.toUpperCase))
    val partitionMerged = keptPartition.nonEmpty
    val isTable = qm.isAggregateQuery || partitionMerged
    val kind = if (isTable) "TABLE" else "STREAM"

    val style = options.keyPathStyle
    val selectList =
      if (qm.select.isEmpty) "*"
      else qm.select.map(c => applyKeyStyle(renderColumn(c), sourceKeys, style))
        .mkString(", ")
    val sb = new StringBuilder
    val ifne = if (options.ifNotExists) " IF NOT EXISTS" else ""
    sb ++= s"CREATE $kind$ifne ${ident(streamName)} "
    val withParts = Seq(s"KAFKA_TOPIC='${streamName.toLowerCase}'") ++
      (if (qm.source.hasKeys)
        Seq(s"KEY_FORMAT='${if (qm.source.isCompositeKey) "AVRO" else "KAFKA"}'")
      else Nil) ++
      Seq("VALUE_FORMAT='AVRO'") ++
      options.partitions.map(p => s"PARTITIONS=$p") ++
      options.replicas.map(r => s"REPLICAS=$r")
    sb ++= withParts.mkString("WITH (", ", ", ") AS\n")
    sb ++= s"SELECT $selectList\n"
    qm.join match {
      case None =>
        sb ++= s"FROM ${ident(qm.source.name)}"
        options.sourceAlias.foreach(a => sb ++= s" $a")
      case Some(j) =>
        // two-source join: fixed o/i aliases (BuildKeyAliasMap,
        // cs:487-500) and the 300 s WITHIN default when none is given
        // (cs:362-376)
        val kw = if (j.joinType == "left_outer") "LEFT JOIN" else "JOIN"
        val within = j.withinSeconds.getOrElse(300L)
        sb ++= s"FROM ${ident(qm.source.name)} o\n"
        sb ++= s"$kw ${ident(j.right.name)} i WITHIN $within SECONDS "
        sb ++= s"ON ${renderColumn(j.condition)}"
    }
    qm.tumbling.foreach(t => sb ++= s"\n${windowTumbling(t.timeframes.head)}")
    qm.hopping.foreach(h => sb ++=
      s"\nWINDOW HOPPING (SIZE ${h.size.toSeconds} SECONDS, ADVANCE BY ${h.advanceBy.toSeconds} SECONDS)")
    if (qm.wheres.nonEmpty)
      sb ++= s"\nWHERE ${qm.wheres.map(c => applyKeyStyle(renderColumn(c), sourceKeys, style)).mkString(" AND ")}"
    if (mergedGroupBy.nonEmpty)
      sb ++= s"\nGROUP BY ${mergedGroupBy.map(applyKeyStyle(_, sourceKeys, style)).mkString(", ")}"
    sb ++= "\nEMIT CHANGES;"
    sb.toString
  }

  /** Token replacement implementing the key-path styles on a rendered
    * clause (`ApplyKeyStyle`, cs:521-583): each source-key identifier
    * becomes `KEY->COL` / `key.COL`, skipping tokens already prefixed,
    * quoted tokens, and — via the reference's `ShouldReplace` lookback —
    * the token immediately after `AS` (a projection alias names the
    * OUTPUT column, which has no key path).
    */
  private[graft] def applyKeyStyle(
      clause: String,
      keys: Seq[String],
      style: KeyPathStyle
  ): String =
    if (style == KeyPathStyle.Flat || keys.isEmpty) clause
    else keys.foldLeft(clause) { (acc, key) =>
      val prefixed = style match {
        case KeyPathStyle.Dot => s"key.$key"
        case _                => s"KEY->$key"
      }
      val re = ("(?i)(?<!KEY->)(?<!key\\.)(?<![`'\"])\\b" +
        java.util.regex.Pattern.quote(key) + "\\b(?![`'\"])").r
      re.replaceAllIn(acc, m => {
        val before = acc.substring(0, m.start).reverse.dropWhile(_.isWhitespace)
        val prevToken = before.takeWhile(_.isLetter).reverse
        if (prevToken.equalsIgnoreCase("AS")) m.matched
        else java.util.regex.Matcher.quoteReplacement(prefixed)
      })
    }

  private def windowTumbling(p: Period): String = p match {
    case Period.Seconds(n)  => s"WINDOW TUMBLING (SIZE $n SECONDS)"
    case Period.Minutes(n)  => s"WINDOW TUMBLING (SIZE $n MINUTES)"
    case Period.Hours(n)    => s"WINDOW TUMBLING (SIZE $n HOURS)"
    case Period.Days(n)     => s"WINDOW TUMBLING (SIZE $n DAYS)"
    case Period.Weeks(n, _) => s"WINDOW TUMBLING (SIZE ${n * 7} DAYS)"
    case Period.Months(n)   => s"WINDOW TUMBLING (SIZE $n MONTHS)"
  }

  // ---- expression rendering ------------------------------------------------

  /** KSQL uppercases bare identifiers; emit them pre-uppercased so the
    * script round-trips byte-identically through ksqlDB's parser.
    */
  private def ident(s: String): String = s.toUpperCase

  def renderColumn(c: Column): String =
    render(ColumnBridge.catalystExpression(c))

  /** Spark registration name → KSQL name, inverting
    * `graft.functions.KFunctions`' dialect registry (KFunctions.scala:19).
    */
  private val ksqlName: Map[String, String] = Map(
    "upper" -> "UCASE", "lower" -> "LCASE", "length" -> "LEN",
    "locate" -> "INSTR", "instr" -> "INSTR",
    "pow" -> "POWER", "ln" -> "LN",
    "ceil" -> "CEIL", "floor" -> "FLOOR",
    "concat_ws" -> "CONCAT_WS"
  )

  private val infix: Map[String, String] = Map(
    "=" -> "=", "==" -> "=", ">" -> ">", "<" -> "<", ">=" -> ">=",
    "<=" -> "<=", "+" -> "+", "-" -> "-", "*" -> "*", "/" -> "/",
    "%" -> "%", "and" -> "AND", "or" -> "OR", "!=" -> "<>", "<>" -> "<>"
  )

  private[graft] def render(e: Expression): String = e match {
    case Alias(child, name) => s"${render(child)} AS ${ident(name)}"
    // qualified attrs keep their qualifier (`o.CUSTOMERID` — the
    // two-source alias convention, fixed o/i like the reference's
    // BuildKeyAliasMap); bare attrs render bare
    case a: UnresolvedAttribute => ident(a.nameParts.mkString("."))
    case Literal(null, _) => "NULL"
    case Literal(v: org.apache.spark.unsafe.types.UTF8String, StringType) =>
      s"'${v.toString.replace("'", "''")}'"
    case Literal(v: Boolean, BooleanType) => if (v) "TRUE" else "FALSE"
    case Literal(v, _) => v.toString
    case c: Cast => s"CAST(${render(c.child)} AS ${ksqlType(c.dataType)})"
    case CaseWhen(branches, elseValue) =>
      val whens = branches
        .map { case (w, t) => s"WHEN ${render(w)} THEN ${render(t)}" }
        .mkString(" ")
      val els = elseValue.map(v => s" ELSE ${render(v)}").getOrElse("")
      s"CASE $whens$els END"
    case f: UnresolvedFunction =>
      val n = f.nameParts.last.toLowerCase
      val args = f.arguments
      n match {
        case op if infix.contains(op) && args.size == 2 =>
          s"(${render(args.head)} ${infix(op)} ${render(args(1))})"
        case "not" | "!" => s"(NOT ${render(args.head)})"
        case "isnull" => s"(${render(args.head)} IS NULL)"
        case "isnotnull" => s"(${render(args.head)} IS NOT NULL)"
        case "in" =>
          s"(${render(args.head)} IN (${args.tail.map(render).mkString(", ")}))"
        case "contains" =>
          s"(INSTR(${render(args.head)}, ${render(args(1))}) > 0)"
        case "startswith" =>
          s"(${render(args.head)} LIKE ${likePrefix(args(1))})"
        case "like" =>
          s"(${render(args.head)} LIKE ${render(args(1))})"
        case "count" if f.isDistinct =>
          s"COUNT_DISTINCT(${args.map(render).mkString(", ")})"
        // KSQL's *_BY_OFFSET take only the value column — offset order is
        // the stream order itself. graft's DSL carries the explicit
        // time/offset column (max_by/min_by); rendering drops it.
        case "max_by" => s"LATEST_BY_OFFSET(${render(args.head)})"
        case "min_by" => s"EARLIEST_BY_OFFSET(${render(args.head)})"
        case "to_date" => s"CAST(${render(args.head)} AS DATE)"
        case other =>
          val ksql = ksqlName.getOrElse(other, other.toUpperCase)
          s"$ksql(${args.map(render).mkString(", ")})"
      }
    // resolved/other nodes (custom Expressions, window struct fields):
    // Catalyst's own SQL text is the documented fallback — valid Spark SQL,
    // flagged in scaladoc as outside the pinned KSQL surface
    case other => other.sql
  }

  private def likePrefix(e: Expression): String = e match {
    case Literal(v: org.apache.spark.unsafe.types.UTF8String, StringType) =>
      s"'${v.toString.replace("'", "''")}%'"
    case o => s"CONCAT(${render(o)}, '%')"
  }

  /** Spark type → KSQL type (`docs: ksqlDB data types`). */
  private[graft] def ksqlType(dt: DataType): String = dt match {
    case IntegerType | ShortType | ByteType => "INTEGER"
    case LongType => "BIGINT"
    case FloatType | DoubleType => "DOUBLE"
    case StringType => "VARCHAR"
    case BooleanType => "BOOLEAN"
    case TimestampType | TimestampNTZType => "TIMESTAMP"
    case DateType => "DATE"
    case BinaryType => "BYTES"
    case d: DecimalType => s"DECIMAL(${d.precision}, ${d.scale})"
    case ArrayType(el, _) => s"ARRAY<${ksqlType(el)}>"
    case MapType(k, v, _) => s"MAP<${ksqlType(k)}, ${ksqlType(v)}>"
    case StructType(fields) =>
      fields
        .map(f => s"${ident(f.name)} ${ksqlType(f.dataType)}")
        .mkString("STRUCT<", ", ", ">")
    case other => other.sql
  }
}
