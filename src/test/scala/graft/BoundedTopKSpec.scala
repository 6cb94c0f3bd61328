package graft

import graft.functions.{BoundedTopK, KFunctions}
import org.apache.spark.sql.functions._

/** The bounded-heap TOPK aggregate: equivalence with the composite
  * form on real data, dedup variant, partial-merge correctness across
  * many partitions.
  */
class BoundedTopKSpec extends SparkSpec {
  import spark.implicits._

  test("bounded_topk equals the composite sort/slice form on events data") {
    BoundedTopK.register(spark)
    val ev = graft.sources.Tables.load(spark, "/root/testdata/sf0.001", "events")
    val heap = ev.groupBy($"event_type")
      .agg(expr("bounded_topk(value, 5)").as("top"))
      .collect().map(r => r.getString(0) -> r.getSeq[Double](1)).toMap
    val composite = ev.groupBy($"event_type")
      .agg(KFunctions.topK($"value", 5).as("top"))
      .collect().map(r => r.getString(0) -> r.getSeq[Double](1)).toMap
    assert(heap == composite)
  }

  test("bounded_topk_distinct deduplicates") {
    BoundedTopK.register(spark)
    val df = Seq(5.0, 5.0, 4.0, 4.0, 3.0, 1.0).toDF("v").repartition(4)
    val top = df.agg(expr("bounded_topk_distinct(v, 3)")).head.getSeq[Double](0)
    assert(top == Seq(5.0, 4.0, 3.0))
  }

  test("merge across partitions keeps the global top-k with bounded buffers") {
    BoundedTopK.register(spark)
    val df = spark.range(0, 100000).select(($"id" % 99991).cast("double").as("v"))
      .repartition(32)
    val top = df.agg(expr("bounded_topk(v, 3)")).head.getSeq[Double](0)
    assert(top == Seq(99990.0, 99989.0, 99988.0))
  }

  test("typed inputs: strings and longs keep their type (ksqlDB TOPK semantics)") {
    BoundedTopK.register(spark)
    // strings exercise the length-prefixed serde + UTF8String ownership
    // across partial buffers; repartition forces serialize/merge
    val s = Seq("pear", "apple", "quince", "fig", "pear").toDF("v").repartition(3)
      .agg(expr("bounded_topk_distinct(v, 3)")).head.getSeq[String](0)
    assert(s == Seq("quince", "pear", "fig"))
    val l = spark.range(0, 1000).toDF("v").repartition(4)
      .agg(expr("bounded_topk(v, 2)")).head.getSeq[Long](0)
    assert(l == Seq(999L, 998L))
    // decimals exercise the unscaled-BigInteger serde (incl. negatives)
    val d = Seq("3.14", "-2.72", "9.99", "0.01").map(new java.math.BigDecimal(_))
      .toDF("v").repartition(3)
      .agg(expr("bounded_topk(v, 3)")).head.getSeq[java.math.BigDecimal](0)
    // the product encoder widens to DECIMAL(38,18) — compare canonically
    assert(d.map(_.stripTrailingZeros.toPlainString) == Seq("9.99", "3.14", "0.01"))
    // unorderable input types are rejected at analysis
    intercept[Exception] {
      Seq(Array(1.0)).toDF("v").agg(expr("bounded_topk(v, 2)")).collect()
    }
  }

  test("k must be positive; nulls are ignored") {
    BoundedTopK.register(spark)
    intercept[Exception] {
      Seq(1.0).toDF("v").agg(expr("bounded_topk(v, 0)")).collect()
    }
    val withNulls = Seq(Some(2.0), None, Some(1.0)).toDF("v")
    val top = withNulls.agg(expr("bounded_topk(v, 5)")).head.getSeq[Double](0)
    assert(top == Seq(2.0, 1.0))
  }
}
