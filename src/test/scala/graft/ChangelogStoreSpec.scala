package graft

import graft.sources.ChangelogStore

import java.nio.file.Files

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
