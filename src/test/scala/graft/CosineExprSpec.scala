package graft

import graft.operators.Similarity
import graft.sources.Tables
import org.apache.spark.sql.functions._

/** Native CosineSimilarity expression ≡ the composed built-ins form,
  * bit-for-bit, on real embeddings.
  */
class CosineExprSpec extends SparkSpec {
  import spark.implicits._

  test("native expression matches composed form bit-for-bit on embeddings") {
    val emb = Tables.load(spark, "/root/testdata/sf0.001", "embeddings")
    val pairs = emb.alias("a").join(
      emb.alias("b"),
      col("b.vec_id") === col("a.vec_id") + 1
    )
    val both = pairs.select(
      Similarity.cosine(col("a.embedding"), col("b.embedding")).as("native"),
      Similarity.cosineComposed(col("a.embedding"), col("b.embedding")).as("composed")
    )
    val diffs = both.filter(col("native") =!= col("composed")).count()
    assert(diffs == 0)
    assert(both.count() > 400)
  }

  test("registered cosine_sim is usable from SQL") {
    graft.functions.CosineSimilarity.register(spark)
    Tables.load(spark, "/root/testdata/sf0.001", "embeddings")
      .createOrReplaceTempView("emb_v")
    val v = spark.sql(
      "SELECT cosine_sim(a.embedding, a.embedding) AS c FROM emb_v a WHERE a.vec_id = 0")
      .head.getDouble(0)
    assert(math.abs(v - 1.0) < 1e-12) // self-similarity
  }

  test("type check rejects non-array inputs") {
    val e = intercept[Exception] {
      Seq((1, 2)).toDF("a", "b")
        .select(Similarity.cosine(col("a"), col("b"))).collect()
    }
    assert(e.getMessage.toLowerCase.contains("cosine_sim") ||
      e.getMessage.toLowerCase.contains("datatype_mismatch"))
  }
}
