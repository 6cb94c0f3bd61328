package graft

import graft.sources.Lake
import org.apache.spark.sql.execution.FileSourceScanExec
import org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanHelper
import org.apache.spark.sql.functions._

import java.nio.file.Files

/** Z-order clustering: multi-dimensional row-group pruning measured
  * from executed scan metrics — a file layout claim is only real if
  * the scan actually decodes fewer rows.
  */
class ZOrderSpec extends SparkSpec with AdaptiveSparkPlanHelper {
  import spark.implicits._

  /** Rows the executed scan DECODED (post row-group pruning). */
  private def scannedRows(df: org.apache.spark.sql.DataFrame): Long = {
    df.collect()
    collectWithSubqueries(df.queryExecution.executedPlan) {
      case s: FileSourceScanExec => s.metrics("numOutputRows").value
    }.sum
  }

  test("z-order prunes row groups on the NON-leading dimension; linear sort cannot") {
    // 256×256 uniform grid — every (x, y) exactly once, shuffled ids
    val grid = spark
      .range(0, 65536)
      .select(
        ($"id" % 256).as("x"),
        ($"id" / 256).cast("long").as("y"),
        $"id".as("payload"))

    val zDir = Files.createTempDirectory("graft_zorder").toString
    val linDir = Files.createTempDirectory("graft_linear").toString
    // 64 files ≈ 1024 rows each; small row groups make pruning visible
    Lake.writeZOrdered(grid, Seq("x", "y"), zDir, bits = 8, numFiles = 64)
    grid
      .repartitionByRange(64, $"x")
      .sortWithinPartitions($"x")
      .write.mode("overwrite").parquet(linDir)

    def q(path: String) =
      spark.read.parquet(path).filter($"y" >= 0 && $"y" <= 15)

    // correctness first: both layouts return the identical 16-row band
    val zRows = q(zDir)
    val linRows = q(linDir)
    assert(zRows.agg(count(lit(1)), sum($"x")).head() ==
      linRows.agg(count(lit(1)), sum($"x")).head())

    // the y-band is 1/16 of the data. Linear-by-x: every file spans all
    // of y → stats prune nothing → the scan decodes everything.
    val linScanned = scannedRows(q(linDir))
    assert(linScanned == 65536L,
      s"x-sorted layout should decode all rows for a y-only filter, got $linScanned")

    // Z-ordered: each file covers a compact (x, y) rectangle → files
    // outside the band are skipped by parquet min/max stats.
    val zScanned = scannedRows(q(zDir))
    assert(zScanned <= 65536L / 4,
      s"z-ordered layout should skip most row groups, decoded $zScanned")

    // and the leading dimension still prunes too (no regression vs
    // the linear layout's own strength)
    val zxScanned = scannedRows(
      spark.read.parquet(zDir).filter($"x" >= 0 && $"x" <= 15))
    assert(zxScanned <= 65536L / 4,
      s"x-filter should prune the z layout as well, decoded $zxScanned")
  }

  test("quantile boundaries keep bucket occupancy even under skew") {
    // 90% of mass at x < 100; uniform boundaries would put it in ~3
    // buckets (giant files), quantile boundaries spread it evenly
    val skewed = spark
      .range(0, 50000)
      .select(
        when($"id" % 10 =!= 0, $"id" % 100)
          .otherwise(($"id" % 10000) * 6553).as("x"),
        $"id".as("payload"))
    val dir = Files.createTempDirectory("graft_zskew").toString
    Lake.writeZOrdered(skewed, Seq("x"), dir, bits = 4, numFiles = 16)
    // group by the physical FILE (read splits pack small files together,
    // so spark_partition_id would under-count the file count)
    val sizes = spark.read.parquet(dir)
      .groupBy(input_file_name()).count().select($"count").as[Long].collect()
    // no output file holds more than ~4× the even share
    assert(sizes.max <= 4L * 50000 / 16,
      s"skewed key overloaded a z-range file: ${sizes.sorted.mkString(",")}")
  }
}
