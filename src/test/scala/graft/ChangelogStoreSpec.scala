package graft

import graft.sources.ChangelogStore

import java.nio.file.Files

case class HeaderRow(id: Int, v: String)

/** Produce path: AddAsync/RemoveAsync semantics over the file-backed
  * changelog — latest-per-key compaction, tombstone deletes.
  */
class ChangelogStoreSpec extends SparkSpec {
  import spark.implicits._

  test("add/upsert/remove compact to the latest live value per key") {
    val root = Files.createTempDirectory("store").toString
    val store = new ChangelogStore(spark, root)

    store.add("quotes", Seq(("b1", "X", 10.0), ("b1", "Y", 20.0)).toDF("broker", "symbol", "price"))
    store.add("quotes", Seq(("b1", "X", 11.0)).toDF("broker", "symbol", "price")) // upsert
    store.remove("quotes", Seq(("b1", "Y", 0.0)).toDF("broker", "symbol", "price")) // tombstone

    val snap = store.snapshot("quotes", Seq("broker", "symbol"))
      .select("broker", "symbol", "price").as[(String, String, Double)].collect().toSet
    assert(snap == Set(("b1", "X", 11.0)))

    // the raw log keeps the full history (4 records)
    assert(store.log("quotes").count() == 4)
    assert(store.exists("quotes") && !store.exists("nope"))
  }

  test("produce headers ride the changelog and reach forEachWithMeta, not the snapshot") {
    val root = Files.createTempDirectory("store").toString
    val store = new ChangelogStore(spark, root)
    store.add(
      "hq",
      Seq((1, "a")).toDF("id", "v"),
      Map("trace-id" -> "t-17", "source" -> "import")
    )
    store.add("hq", Seq((2, "b")).toDF("id", "v")) // no headers

    // headers are record metadata: on the log, not the compacted value view
    assert(store.log("hq").columns.contains("__headers"))
    assert(!store.snapshot("hq", Seq("id")).columns.contains("__headers"))

    // consume with meta through the EventSet facade over the raw log
    val ctx = new GraftContext(spark, { case "hq" => store.log("hq") })
    val set = ctx.eventSet(graft.core.EntityModel[HeaderRow]("hq").key("id"))
    val seen = scala.collection.mutable.ArrayBuffer.empty[(Int, Map[String, String], Long)]
    set.forEachWithMeta((r, h, m) => seen += ((r.id, h, m.offset)))
    assert(seen.map(_._1).toSeq == Seq(1, 2)) // __seq (offset) order
    assert(seen(0)._2 == Map("trace-id" -> "t-17", "source" -> "import"))
    assert(seen(1)._2.isEmpty)
    assert(seen(0)._3 < seen(1)._3) // produce-sequence offsets
  }

  test("TimeBucket.set appends import bars into the period's table, schema-checked") {
    val dir = Files.createTempDirectory("bars").toString
    Seq((java.sql.Timestamp.valueOf("2024-01-01 10:00:00"), "A", 5L))
      .toDF("window_start", "sym", "cnt")
      .write.parquet(s"$dir/5m")
    val plan = graft.streaming.BarCascade.CascadePlan(
      hubPath = s"$dir/hub",
      livePaths = Map("5m" -> s"$dir/5m"),
      fillPaths = Map.empty,
      queries = Nil
    )
    val writer = graft.streaming.TimeBucket.set(spark, plan, graft.core.Period.Minutes(5))
    writer.write(
      Seq((java.sql.Timestamp.valueOf("2024-01-01 10:05:00"), "A", 7L))
        .toDF("window_start", "sym", "cnt")
    )
    val got = graft.streaming.TimeBucket.get(spark, plan, graft.core.Period.Minutes(5))
    assert(got.count() == 2)
    intercept[IllegalArgumentException] {
      writer.write(Seq(("bad", 1)).toDF("x", "y"))
    }
    intercept[IllegalArgumentException] {
      graft.streaming.TimeBucket.set(spark, plan, graft.core.Period.Minutes(1))
    }
  }

  test("compaction bounds the log to one live record per key and later produces still win") {
    val root = Files.createTempDirectory("store_compact").toString
    val store = new ChangelogStore(spark, root)

    // produce history: 3 upserts for X, 1 for Y, Y tombstoned
    store.add("q2", Seq(("b", "X", 1.0)).toDF("broker", "symbol", "price"))
    store.add("q2", Seq(("b", "X", 2.0), ("b", "Y", 9.0)).toDF("broker", "symbol", "price"))
    store.add("q2", Seq(("b", "X", 3.0)).toDF("broker", "symbol", "price"))
    store.remove("q2", Seq(("b", "Y", 0.0)).toDF("broker", "symbol", "price"))
    assert(store.log("q2").count() == 5)

    store.compact("q2", Seq("broker", "symbol"))
    // exactly the live working set remains in the LOG itself
    assert(store.log("q2").count() == 1)
    val snap0 = store.snapshot("q2", Seq("broker", "symbol"))
      .select("broker", "symbol", "price").as[(String, String, Double)].collect().toSet
    assert(snap0 == Set(("b", "X", 3.0)))

    // produces after compaction order after the surviving rows
    store.add("q2", Seq(("b", "X", 4.0)).toDF("broker", "symbol", "price"))
    val snap1 = store.snapshot("q2", Seq("broker", "symbol"))
      .select("broker", "symbol", "price").as[(String, String, Double)].collect().toSet
    assert(snap1 == Set(("b", "X", 4.0)))
  }

  test("re-adding after a tombstone resurrects the key") {
    val root = Files.createTempDirectory("store").toString
    val store = new ChangelogStore(spark, root)
    val row = Seq(("b1", "X", 1.0)).toDF("broker", "symbol", "price")
    store.add("q2", row)
    store.remove("q2", row)
    store.add("q2", Seq(("b1", "X", 2.0)).toDF("broker", "symbol", "price"))
    val snap = store.snapshot("q2", Seq("broker", "symbol"))
      .select("price").as[Double].collect().toSeq
    assert(snap == Seq(2.0))
  }
}
