package graft.examples

import graft.operators.Curation
import graft.sources.Tables
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** The integrated training-data curation job over the documents table:
  * language gate → quality gate → PII scrub → normalize → exact dedup,
  * one plan (see `Curation.curate` and SCALE.md). Prints the kept-doc
  * stats per source.
  *
  * Run: `sbt "runMain graft.examples.CurationJob [sfDir]"`
  */
object CurationJob {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.001")
    val spark = SparkSession.builder().master("local[4]")
      .withExtensions(new graft.GraftExtensions)
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    val kept = Curation.curate(
      Tables.load(spark, sfDir, "documents"),
      "doc_id", "text",
      keepLang = "en", minQuality = 0.5, carry = Seq("source")
    )
    kept
      .groupBy(col("source"))
      .agg(
        count(lit(1)).as("docs_kept"),
        sum(col("dup_count")).as("docs_in"),
        round(avg(col("quality")), 4).as("avg_quality")
      )
      .orderBy(col("source"))
      .show(50, truncate = false)

    spark.stop()
  }
}
