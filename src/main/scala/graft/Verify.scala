package graft
import org.apache.spark.sql.SparkSession
import java.nio.file.{Files, Paths}
/** Driver-run correctness dump: each SparkEntry.queries result → parquet,
  * plus oracle_sql.json, for the driver's DuckDB compare. */
object Verify {
  def main(args: Array[String]): Unit = {
    val Array(sfDir, outDir) = args
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val spark = SparkSession.builder()
      .withExtensions(new GraftExtensions)
      .master(s"local[$cpus]")
      // SPARK_GRAFT_SHUFFLE decouples shuffle width from thread count:
      // large-SF runs of window-heavy queries need per-task sorts far
      // smaller than |data|/threads (the q_hard_negatives sf10 sort
      // outgrew its pointer array at 24 partitions)
      .config("spark.sql.shuffle.partitions",
        sys.env.getOrElse("SPARK_GRAFT_SHUFFLE", cpus))
      // every graft TypedImperativeAggregate carries a BOUNDED buffer
      // (k-heaps, capped histograms, single min/max pairs, fixed-size
      // sketches), so a large per-task hash map is safe — but the
      // DEFAULT fallback threshold (128 distinct groups!) silently
      // turns ObjectHashAggregate into a sort-based pass over every
      // input row: at the q_hard_negatives sf10 shape that re-created
      // the exact 300 GB spill the bounded heap exists to avoid
      .config("spark.sql.objectHashAggregate.sortBased.fallbackThreshold",
        "16777216")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    new java.io.File(outDir).mkdirs()
    // a reused outDir may hold results for queries that no longer exist
    // (e.g. ones moved to the bench-only registry) — remove them so the
    // driver's compare never reads a stale row
    Option(new java.io.File(outDir).listFiles()).getOrElse(Array.empty)
      .filter(f => f.isDirectory && f.getName.startsWith("q_")
        && !SparkEntry.queries.contains(f.getName))
      .foreach { dir =>
        def rm(f: java.io.File): Unit = {
          Option(f.listFiles()).getOrElse(Array.empty).foreach(rm)
          f.delete()
        }
        System.err.println(s"[verify] removing stale result ${dir.getName}")
        rm(dir)
      }
    // SPARK_GRAFT_ONLY=q_a,q_b limits the dump (spot-passes at large
    // scale factors, where a full run would pay every codec query);
    // check_oracle.py takes the same subset as positional args
    val only = sys.env.get("SPARK_GRAFT_ONLY").map(_.split(",").toSet)
    SparkEntry.queries
      .filter { case (name, _) => only.forall(_.contains(name)) }
      .foreach { case (name, fn) =>
        try fn(spark, sfDir).coalesce(1).write.mode("overwrite")
          .parquet(s"$outDir/$name")
        catch { case e: Throwable =>
          System.err.println(s"[verify] $name failed: ${e.getMessage}")
        }
      }
    // JSON string escape: backslash, quote, and ALL control chars (<0x20)
    // — a tab or CR in builder-authored SQL would otherwise make the
    // driver's json.load fail and silently zero the round's correctness.
    def q(s: String): String = "\"" + s.flatMap {
      case '"'  => "\\\""
      case '\\' => "\\\\"
      case '\n' => "\\n"
      case '\r' => "\\r"
      case '\t' => "\\t"
      case c if c < ' ' => f"\\u${c.toInt}%04x"
      case c => c.toString
    } + "\""
    val json = SparkEntry.oracleSql
      .map { case (k, v) => s"${q(k)}: ${q(v)}" }.mkString("{", ",", "}")
    Files.writeString(Paths.get(s"$outDir/oracle_sql.json"), json)
    spark.stop()
  }
}
