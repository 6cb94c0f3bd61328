package graft

import graft.core.EntityModel
import graft.sources.Bucketing
import org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanHelper
import org.apache.spark.sql.execution.exchange.ShuffleExchangeLike
import org.apache.spark.sql.functions._

import java.nio.file.Files

/** Co-partitioned (bucketed) storage joins — the Spark analog of the
  * reference's co-partitioned-topic requirement
  * (`JoinLimitationEnforcer.cs:45,:130-139`): write once bucketed on
  * the key, then every equi-join on that key runs without a shuffle.
  */
class BucketingSpec extends SparkSpec with AdaptiveSparkPlanHelper {
  import spark.implicits._

  private case class Order(order_id: Long, amount: Double)
  private case class Item(order_id: Long, qty: Long)

  test("co-bucketed equi-join runs with no Exchange on either side") {
    val dir = Files.createTempDirectory("graft_bucketing").toString
    val orders = EntityModel[Order]("orders_b").key("order_id").toTopic("orders", parts = 4)
    val items = EntityModel[Item]("items_b").key("order_id").toTopic("items", parts = 4)

    val odf = spark.range(0, 1000).select($"id".as("order_id"), ($"id" % 97).cast("double").as("amount"))
    val idf = spark.range(0, 3000).select(($"id" % 1000).as("order_id"), ($"id" % 7).as("qty"))

    val ot = Bucketing.materialize(odf, orders, s"$dir/orders")
    val it = Bucketing.materialize(idf, items, s"$dir/items")

    val prevThresh = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    try {
      // force a sort-merge path so the assertion is about bucketing,
      // not about the broadcast threshold
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
      val joined = Bucketing
        .coLocatedJoin(spark, ot, it, Seq("order_id"))
        .groupBy($"order_id")
        .agg(sum($"qty").as("total_qty"), first($"amount").as("amount"))

      // correctness first
      assert(joined.count() == 1000)
      val row = joined.filter($"order_id" === 5L).head
      assert(row.getLong(1) == Seq(5L, 1005L, 2005L).map(_ % 7).sum)

      // plan contract: bucket-by-bucket join, zero shuffles anywhere —
      // even the groupBy on the same key reuses the bucket layout
      val plan = joined.queryExecution.executedPlan
      val shuffles = collectWithSubqueries(plan) { case e: ShuffleExchangeLike => e }
      assert(shuffles.isEmpty, s"expected no Exchange, got:\n$plan")
    } finally {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prevThresh)
      spark.sql(s"DROP TABLE IF EXISTS $ot")
      spark.sql(s"DROP TABLE IF EXISTS $it")
    }
  }

  test("mismatched bucket counts degrade to a correct shuffled join") {
    val dir = Files.createTempDirectory("graft_bucketing_mm").toString
    val a = EntityModel[Order]("orders_mm").key("order_id").toTopic("orders", parts = 4)
    val b = EntityModel[Item]("items_mm").key("order_id").toTopic("items", parts = 3)

    val at = Bucketing.materialize(
      spark.range(0, 100).select($"id".as("order_id"), lit(1.0).as("amount")), a, s"$dir/a")
    val bt = Bucketing.materialize(
      spark.range(0, 100).select($"id".as("order_id"), lit(2L).as("qty")), b, s"$dir/b")

    val prevThresh = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    try {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
      val joined = Bucketing.coLocatedJoin(spark, at, bt, Seq("order_id"))
      // ksqlDB warns and may return wrong results on key-distribution
      // mismatch; Spark adds the Exchange back and stays correct
      assert(joined.count() == 100)
    } finally {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prevThresh)
      spark.sql(s"DROP TABLE IF EXISTS $at")
      spark.sql(s"DROP TABLE IF EXISTS $bt")
    }
  }
}
