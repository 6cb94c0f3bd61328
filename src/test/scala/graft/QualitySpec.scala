package graft

import graft.operators.Quality

/** One-pass constraint checker: metric math, null handling, threshold
  * semantics (the oracle gate pins cross-engine agreement; this pins
  * the MATH).
  */
class QualitySpec extends SparkSpec {
  import spark.implicits._

  private lazy val df = Seq(
    (1L, Some("a"), 10.0, "en"),
    (2L, Some("b"), 20.0, "xx"),
    (3L, None, 99.0, "en"),
    (3L, Some("d"), -5.0, "de") // duplicate id, out-of-range value
  ).toDF("id", "text", "v", "lang")

  test("metrics are exact fractions; nulls and duplicates are violations") {
    val report = Quality
      .check(df, Seq(
        Quality.Complete("text"),
        Quality.Unique("id"),
        Quality.InRange("v", 0, 50),
        Quality.InSet("lang", Seq("en", "de"))))
      .collect()
      .map(r => r.getString(0) -> ((r.getDouble(1), r.getBoolean(2))))
      .toMap
    assert(report("complete_text") == ((0.75, false)))
    assert(report("unique_id") == ((0.75, false)))
    assert(report("range_v") == ((0.5, false)))
    assert(report("set_lang") == ((0.75, false)))
  }

  test("threshold relaxes pass/fail without changing metrics") {
    val report = Quality
      .check(df, Seq(Quality.Complete("text")), threshold = 0.7)
      .head()
    assert(report.getDouble(1) == 0.75 && report.getBoolean(2))
    val strict = Quality
      .check(df, Seq(Quality.Complete("text")), threshold = 0.8)
      .head()
    assert(!strict.getBoolean(2))
  }

  test("all constraints share one aggregate (no per-check scans)") {
    val plan = Quality
      .check(df, Seq(
        Quality.Complete("text"),
        Quality.InRange("v", 0, 50),
        Quality.InSet("lang", Seq("en")),
        Quality.MatchesRegex("lang", "^[a-z]+$")))
      .queryExecution.executedPlan.toString
    // one scan of the local relation feeding one aggregate pair
    assert("LocalTableScan|Scan ExistingRDD".r.findAllIn(plan).size <= 1,
      s"constraint checks must not multiply scans:\n$plan")
  }
}
