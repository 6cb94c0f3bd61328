package graft

import graft.functions.KFunctions
import org.apache.spark.sql.functions._

/** Function registry: the pieces without a DuckDB oracle (JSON_CONCAT,
  * JSON_RECORDS, SHA1, AS_GEOJSON), context-validity flags, and custom
  * registration (`RegisterCustomMapping` analog).
  */
class FunctionsSpec extends SparkSpec {
  import spark.implicits._

  test("jsonConcat merges flat objects, right side wins") {
    val df = Seq(("""{"a":"1","b":"2"}""", """{"b":"9","c":"3"}""")).toDF("x", "y")
    val out = df.select(KFunctions.jsonRecords(KFunctions.jsonConcat($"x", $"y")).as("m"))
      .select(map_entries($"m").as("e"))
      .select(explode($"e").as("kv"))
      .collect()
      .map(r => (r.getStruct(0).getString(0), r.getStruct(0).getString(1)))
      .toMap
    assert(out == Map("a" -> "1", "b" -> "9", "c" -> "3"))
  }

  test("jsonRecords parses flat objects to a string map") {
    val df = Seq("""{"k":"87","x":"y"}""").toDF("j")
    val m = df.select(KFunctions.jsonRecords($"j").as("m")).head.getMap[String, String](0)
    assert(m("k") == "87" && m("x") == "y")
  }

  test("sha1 matches the known test vector") {
    // NIST FIPS 180-1 vector; DuckDB 1.0 has no sha1, so this spec is the
    // correctness cover for the SHA1 registry entry
    val h =
      Seq("abc").toDF("s").select(KFunctions.sha1Hex($"s".cast("binary"))).head.getString(0)
    assert(h == "a9993e364706816aba3e25717850c26c9cd0d89d")
  }

  test("jsonArrayContains parses the array with the probe's element type") {
    import org.apache.spark.sql.types.LongType
    val df = Seq("[1,2,5]", "[1,2,9]", "not json").toDF("j")
    val got = df
      .select(KFunctions.jsonArrayContains($"j", lit(5L), LongType).as("c"))
      .collect()
      .map(r => Option(r.get(0)))
    assert(got.toSeq == Seq(Some(true), Some(false), None))
  }

  test("geoDistance: known city pair within tolerance; asGeoJson shape") {
    // Paris (48.8566, 2.3522) – Berlin (52.52, 13.405) ≈ 878 km
    val df = Seq((48.8566, 2.3522, 52.52, 13.405)).toDF("lat1", "lon1", "lat2", "lon2")
    val d = df.select(KFunctions.geoDistanceKm($"lat1", $"lon1", $"lat2", $"lon2")).head.getDouble(0)
    assert(math.abs(d - 878.0) < 5.0)
    val gj = df.select(KFunctions.asGeoJson($"lat1", $"lon1")).head.getString(0)
    assert(gj.startsWith("""{"type":"Point","coordinates":["""))
  }

  test("logBase two-arg form") {
    val v = Seq(8.0).toDF("x").select(KFunctions.logBase(2.0, $"x")).head.getDouble(0)
    assert(math.abs(v - 3.0) < 1e-12)
  }

  test("registry context flags mirror the reference") {
    assert(KFunctions.isAggregateFunction("SUM"))
    assert(KFunctions.isAggregateFunction("latest_by_offset"))
    assert(!KFunctions.isAggregateFunction("UCASE"))
    assert(KFunctions.allowedInGroupBy("SUBSTRING"))
    assert(KFunctions.allowedInGroupBy("ROUND"))
    assert(!KFunctions.allowedInGroupBy("SPLIT"))
  }

  test("custom function registration (RegisterCustomMapping analog)") {
    KFunctions.registerCustom("double_it", cols => cols.head * 2)
    val f = KFunctions.customFn("DOUBLE_IT").get
    val v = Seq(21).toDF("x").select(f(Seq($"x"))).head.getInt(0)
    assert(v == 42)
    assert(KFunctions.customFn("nope").isEmpty)
  }

  test("topK / histogram composites") {
    val df = Seq(1, 5, 3, 5, 2).toDF("v")
    val top = df.agg(KFunctions.topK($"v", 2)).head.getSeq[Int](0)
    assert(top == Seq(5, 5))
    val topD = df.agg(KFunctions.topKDistinct($"v", 2)).head.getSeq[Int](0)
    assert(topD == Seq(5, 3))
    val hist = df
      .groupBy($"v").count()
      .agg(KFunctions.histogramEntries($"v", $"count").as("h"))
      .head.getMap[Int, Long](0)
    assert(hist(5) == 2 && hist(1) == 1)
  }
}
