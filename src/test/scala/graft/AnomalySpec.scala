package graft

import graft.operators.Anomaly
import org.apache.spark.sql.functions._

/** Hand-computed pins for the monitoring operators (the oracle gate
  * proves cross-engine agreement; these prove the MATH).
  */
class AnomalySpec extends SparkSpec {
  import spark.implicits._

  test("psiDrift bins by the LARGEST matching edge (case-chain order)") {
    // edges (10, 20): bins are (-inf,10)→0, [10,20)→1, [20,inf)→2
    val ref = Seq(5.0, 15.0, 25.0).toDF("v")
    val cur = Seq(25.0, 30.0, 9.99).toDF("v")
    val rows = Anomaly
      .psiDrift(ref, cur, "v", Seq(10.0, 20.0))
      .orderBy("bin")
      .collect()
    assert(rows.map(_.getAs[Long]("n_ref")).toSeq == Seq(1L, 1L, 1L))
    assert(rows.map(_.getAs[Long]("n_cur")).toSeq == Seq(1L, 0L, 2L))
    // edge value lands in the UPPER bin
    val edgeRow = Anomaly
      .psiDrift(Seq(10.0).toDF("v"), Seq(20.0).toDF("v"), "v", Seq(10.0, 20.0))
      .orderBy("bin")
      .collect()
    assert(edgeRow.map(_.getAs[Long]("n_ref")).toSeq == Seq(0L, 1L, 0L))
    assert(edgeRow.map(_.getAs[Long]("n_cur")).toSeq == Seq(0L, 0L, 1L))
  }

  test("psiDrift matches the hand-computed PSI with Laplace smoothing") {
    // ref: 8 in bin0, 2 in bin1; cur: 2 in bin0, 8 in bin1; edge (10)
    val ref = ((1 to 8).map(_ => 5.0) ++ (1 to 2).map(_ => 15.0)).toDF("v")
    val cur = ((1 to 2).map(_ => 5.0) ++ (1 to 8).map(_ => 15.0)).toDF("v")
    val rows = Anomaly.psiDrift(ref, cur, "v", Seq(10.0)).orderBy("bin").collect()
    val tr = 12.0; val tc = 12.0 // 10 + 2 bins Laplace mass
    def term(cr: Long, cn: Long): Double = {
      val p = (cr + 1) / tr; val q = (cn + 1) / tc
      BigDecimal((q - p) * math.log(q / p))
        .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    }
    assert(rows(0).getAs[Double]("psi_term") == term(8, 2))
    assert(rows(1).getAs[Double]("psi_term") == term(2, 8))
    // direction sanity: mass moved 0→1, so both terms are positive
    assert(rows.forall(_.getAs[Double]("psi_term") > 0))
  }

  test("zScoreOutliers flags exactly the rows beyond the threshold") {
    // group g: values 0,0,0,0,100 — mean 20, var (10000−2000)/4 = 2000,
    // sd ≈ 44.72, z(100) = 80/44.72 ≈ 1.789 → flagged at 1.7, not 2.0
    val df = Seq(
      (1L, "g", 0.0), (2L, "g", 0.0), (3L, "g", 0.0), (4L, "g", 0.0),
      (5L, "g", 100.0)
    ).toDF("id", "k", "v")
    val flagged = Anomaly
      .zScoreOutliers(df, "k", "v", Seq("id"), threshold = 1.7)
      .select("id").as[Long].collect().toSet
    assert(flagged == Set(5L))
    val z5 = Anomaly
      .zScoreOutliers(df, "k", "v", Seq("id"), threshold = 1.7)
      .select("z").as[Double].head()
    assert(math.abs(z5 - 80.0 / math.sqrt(2000.0)) < 1e-6)
    val at2 = Anomaly
      .zScoreOutliers(df, "k", "v", Seq("id"), threshold = 2.0)
      .count()
    assert(at2 == 0L)
  }
}
