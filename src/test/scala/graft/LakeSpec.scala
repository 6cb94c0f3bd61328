package graft

import graft.sources.{Lake, Tables}
import org.apache.spark.sql.execution.FileSourceScanExec
import org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanHelper
import org.apache.spark.sql.functions._

import java.nio.file.Files

/** Day-partitioned lake layout: a time-bounded read must prune
  * partitions at planning time — asserted from the executed scan's
  * selected-partition count, not just the plan text.
  */
class LakeSpec extends SparkSpec with AdaptiveSparkPlanHelper {

  test("readRange prunes day partitions at the scan") {
    val dir = Files.createTempDirectory("graft_lake").toString
    val ev = Tables.load(spark, "/root/testdata/sf0.001", "events")
    Lake.materializeByDay(ev, "ts", dir)

    val allDays = spark.read.parquet(dir).select(col("day")).distinct().count()
    assert(allDays > 3, s"fixture needs several day shards, got $allDays")

    val bounds = ev.agg(min(col("ts")).cast("date").cast("string")).head.getString(0)
    val from = bounds
    val to = java.time.LocalDate.parse(bounds).plusDays(2).toString

    val read = Lake.readRange(spark, dir, "ts", from, to)
    // run THIS DataFrame's own execution so its scan metrics populate
    // (count() would wrap a new queryExecution and leave these at 0)
    val got = read.collect().length

    val scans = collectWithSubqueries(read.queryExecution.executedPlan) {
      case s: FileSourceScanExec => s
    }
    assert(scans.nonEmpty)
    val selected = scans.head.metrics("numPartitions").value
    assert(
      selected == 2,
      s"expected 2 pruned day partitions of $allDays, scanned $selected"
    )

    // and the rows really are the bounded range
    val expected = ev
      .filter(col("ts") >= lit(from).cast("timestamp") && col("ts") < lit(to).cast("timestamp"))
      .count()
    assert(got == expected)

    // a toExclusive WITH a time-of-day component must include the
    // partial final day's partition (a `day <` bound would silently
    // drop its morning rows)
    val toPartial = s"$to 12:00:00"
    val partial = Lake.readRange(spark, dir, "ts", from, toPartial)
    val gotPartial = partial.collect().length
    val expectedPartial = ev
      .filter(col("ts") >= lit(from).cast("timestamp") &&
        col("ts") < lit(toPartial).cast("timestamp"))
      .count()
    assert(gotPartial == expectedPartial && gotPartial > got)
    val partialScan = collectWithSubqueries(partial.queryExecution.executedPlan) {
      case s: FileSourceScanExec => s
    }.head
    assert(partialScan.metrics("numPartitions").value == 3)
  }

  test("TimeBucket pull read prunes the PERSISTED bar table by WINDOWSTART") {
    // the production pull path (ref: src/Runtime/HoppingWindow.cs:33-76)
    // reads a MATERIALIZED bar table, not the in-memory derivation the
    // gated q_timebucket_read pins — a WINDOWSTART >= bound must prune
    // day partitions at planning time and push the residual filter into
    // the parquet scan, or the pull scans the whole bar history.
    val dir = Files.createTempDirectory("graft_bar_lake").toString
    val bars = SparkEntry.benchQueries("q_bars_1s")(spark, "/root/testdata/sf0.001")
    Lake.materializeByDay(bars, "window_start", dir)

    val allDays = spark.read.parquet(dir).select(col("day")).distinct().count()
    assert(allDays >= 3, s"bar fixture needs several day shards, got $allDays")

    val lastDay = spark.read.parquet(dir)
      .agg(max(col("day")).cast("string")).head.getString(0)
    val pull = Lake.readRange(spark, dir, "window_start",
        lastDay, java.time.LocalDate.parse(lastDay).plusDays(1).toString)
      .filter(col("event_type") === "purchase")
      .select(col("window_start"), col("event_type"), col("close"), col("cnt"))
    val got = pull.collect().length
    assert(got > 0)

    val scan = collectWithSubqueries(pull.queryExecution.executedPlan) {
      case s: FileSourceScanExec => s
    }.head
    assert(scan.metrics("numPartitions").value == 1,
      s"WINDOWSTART bound must prune to the one matching day of $allDays")
    // the residual time + event_type predicates reach the parquet scan
    // (row-group min/max skipping inside the selected partition) —
    // read the untruncated metadata, not toString's elided copy
    val pushed = scan.metadata("PushedFilters")
    assert(pushed.contains("GreaterThanOrEqual(window_start"),
      s"window_start must be a pushed filter — got: $pushed")
    assert(pushed.contains("EqualTo(event_type,purchase)"),
      s"event_type equality must be pushed to the scan — got: $pushed")

    // and the pruned read returns exactly the unpruned filter's rows
    val expected = bars
      .filter(col("window_start") >= lit(lastDay).cast("timestamp") &&
        col("event_type") === "purchase")
      .count()
    assert(got == expected, s"pruned pull returned $got rows, expected $expected")
  }

  test("compact rewrites an append-accreted store into few files, content-identical") {
    import spark.implicits._
    val dir = Files.createTempDirectory("graft_compact").toString + "/store"
    // simulate 12 micro-batch appends → ≥ 12 small files
    (0 until 12).foreach { b =>
      spark.range(b * 100, (b + 1) * 100)
        .select($"id", ($"id" * 2).as("v"))
        .coalesce(1).write.mode("append").parquet(dir)
    }
    def parquetFiles = Option(new java.io.File(dir).listFiles()).get
      .count(f => f.isFile && f.getName.endsWith(".parquet"))
    assert(parquetFiles >= 12)
    val before = spark.read.parquet(dir).orderBy($"id").collect()

    val bytes = Option(new java.io.File(dir).listFiles()).get
      .filter(f => f.isFile && f.getName.endsWith(".parquet")).map(_.length()).sum
    val n = Lake.compact(spark, dir, targetBytes = bytes / 3, sortCols = Seq("id"))
    assert(n <= 4 && parquetFiles == n.toInt, s"expected ~3 files, got $parquetFiles (n=$n)")
    assert(spark.read.parquet(dir).orderBy($"id").collect().sameElements(before))
    // no leftover temp/old directories from the swap
    val siblings = Option(new java.io.File(dir).getParentFile.listFiles()).get.map(_.getName)
    assert(!siblings.exists(_.contains("__compact")), siblings.mkString(","))

    // re-running converges: parquet recompression can shrink bytes and
    // fold one more file, after which compact is a stable no-op
    val again = Lake.compact(spark, dir, targetBytes = bytes / 3)
    assert(again <= n && parquetFiles == again.toInt)
    val third = Lake.compact(spark, dir, targetBytes = bytes / 3)
    assert(third == again && parquetFiles == again.toInt)
  }
}
