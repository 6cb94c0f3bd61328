package graft

import org.apache.spark.sql.functions._

/** AQE skew-join splitting — SCALE.md's answer for skewed JOIN keys
  * (salting covers skewed AGGREGATION keys, `q_salted_agg`). A hot key
  * that dwarfs the advisory partition size must be split into multiple
  * tasks at runtime, visible as the `skew=true` marker on the join.
  */
class SkewJoinAqeSpec extends SparkSpec {
  import spark.implicits._

  test("a hot join key splits under AQE instead of serializing one task") {
    val conf = spark.conf
    val saved = Seq(
      "spark.sql.adaptive.enabled",
      "spark.sql.autoBroadcastJoinThreshold",
      "spark.sql.adaptive.autoBroadcastJoinThreshold",
      "spark.sql.adaptive.skewJoin.skewedPartitionFactor",
      "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes",
      "spark.sql.adaptive.advisoryPartitionSizeInBytes",
      "spark.sql.adaptive.coalescePartitions.enabled"
    ).map(k => k -> conf.getOption(k)).toMap
    try {
      conf.set("spark.sql.adaptive.enabled", "true")
      // force a sort-merge join and make the thresholds test-sized
      conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
      conf.set("spark.sql.adaptive.autoBroadcastJoinThreshold", "-1")
      conf.set("spark.sql.adaptive.skewJoin.skewedPartitionFactor", "2")
      conf.set("spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes", "64KB")
      conf.set("spark.sql.adaptive.advisoryPartitionSizeInBytes", "32KB")
      conf.set("spark.sql.adaptive.coalescePartitions.enabled", "false")

      // ~95% of fact rows share key 0, with a payload that gives the hot
      // partition real bytes; dim has one row per key
      val fact = spark
        .range(0, 60000)
        .select(
          when($"id" % 20 =!= 0, lit(0L)).otherwise($"id" % 500).as("k"),
          concat(lit("p" * 64), $"id".cast("string")).as("payload")
        )
      val dim = spark.range(0, 500).select($"id".as("k"), ($"id" * 2).as("v"))

      val joined = fact.join(dim, "k").select(sum(length($"payload")).as("bytes"), sum($"v").as("sv"))
      // collect() runs THIS queryExecution; head() would wrap a new
      // limited one and leave this AQE plan unexecuted
      val row = joined.collect().head
      assert(row.getLong(0) > 0)

      val plan = joined.queryExecution.executedPlan.toString
      assert(plan.contains("skew=true"), s"skew split did not fire:\n$plan")
    } finally saved.foreach {
      case (k, Some(v)) => conf.set(k, v)
      case (k, None)    => conf.unset(k)
    }
  }
}
