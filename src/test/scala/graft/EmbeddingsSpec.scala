package graft

import graft.operators.Embeddings
import org.apache.spark.sql.functions._

/** Whitening/PCA contracts (operators/Embeddings, functions/MatVec,
  * functions/MomentsAgg): the distributed moments pass vs driver-exact,
  * Jacobi eigen correctness, the whitening identity (transformed train
  * covariance = I), rank reduction, and determinism.
  */
class EmbeddingsSpec extends SparkSpec {
  import spark.implicits._

  private val d = 6

  /** Deterministic anisotropic vectors: correlated dims with distinct
    * scales, so the covariance has a non-trivial eigenstructure.
    */
  private def vecs(n: Int): IndexedSeq[Array[Double]] =
    (0 until n).map { i =>
      // 6 independent uniform streams, then a fixed full-rank mix so the
      // covariance is anisotropic AND nondegenerate (whitening needs
      // every eigenvalue > 0)
      val z = Array.tabulate(d) { j =>
        ((i.toLong * (48271 + 101 * j) + 7 * j) % 1009).toDouble / 1009.0 - 0.5
      }
      Array(
        3.0 * z(0) + 1.0 + 0.3 * z(1),
        z(0) + 0.5 * z(1) + 0.2 * z(2),
        z(2) + 0.1 * z(3),
        0.2 * z(3) + z(2) * 0.5 + 0.4 * z(4),
        z(4) + 0.2 * z(5),
        0.05 * z(0) - 0.1 * z(4) + 0.7 * z(5)
      )
    }

  private def df(n: Int) =
    vecs(n).zipWithIndex.map { case (v, i) => (i.toLong, v) }.toDF("id", "vec")

  test("moments aggregate matches driver-exact sums (1e-9, any partitioning)") {
    val n = 5000
    val (cnt, sums, prods) = Embeddings.moments(df(n).repartition(13), "vec", d)
    assert(cnt == n)
    val xs = vecs(n)
    for (i <- 0 until d)
      assert(math.abs(sums(i) - xs.map(_(i)).sum) < 1e-9 * n, s"sum $i")
    var p = 0
    for (i <- 0 until d; j <- i until d) {
      val exact = xs.map(v => v(i) * v(j)).sum
      assert(math.abs(prods(p) - exact) < 1e-9 * n, s"prod ($i,$j)")
      p += 1
    }
  }

  test("jacobi eigen: V L V^T reconstructs, V orthonormal, eigenvalues descending") {
    val (_, _, cov) = Embeddings.covariance(df(4000), "vec", d)
    val (ev, rows) = Embeddings.jacobiEigen(cov)
    assert(ev.sliding(2).forall(w => w(0) >= w(1) - 1e-12))
    // orthonormal rows
    for (a <- 0 until d; b <- 0 until d) {
      val dot = (0 until d).map(k => rows(a)(k) * rows(b)(k)).sum
      assert(math.abs(dot - (if (a == b) 1.0 else 0.0)) < 1e-8, s"ortho ($a,$b)")
    }
    // reconstruction
    for (i <- 0 until d; j <- 0 until d) {
      val rec = (0 until d).map(r => ev(r) * rows(r)(i) * rows(r)(j)).sum
      assert(math.abs(rec - cov(i)(j)) < 1e-8, s"recon ($i,$j)")
    }
  }

  test("whitening: transformed train covariance is the identity") {
    val data = df(4000)
    val model = Embeddings.fitWhitening(data, "vec", d, k = d)
    val out = Embeddings.transform(data, "vec", model)
    val (_, mean, cov) = Embeddings.covariance(out, "whitened", d)
    mean.foreach(m => assert(math.abs(m) < 1e-8, s"mean $m"))
    for (i <- 0 until d; j <- 0 until d)
      assert(math.abs(cov(i)(j) - (if (i == j) 1.0 else 0.0)) < 1e-4,
        s"cov($i,$j)=${cov(i)(j)}")
  }

  test("rank reduction keeps the top-variance subspace") {
    val data = df(4000)
    val full = Embeddings.fitWhitening(data, "vec", d, k = d, whiten = false)
    val model = Embeddings.fitWhitening(data, "vec", d, k = 2, whiten = false)
    // k=2 basis == first two rows of the full basis
    for (r <- 0 until 2; i <- 0 until d)
      assert(model.basis(r)(i) == full.basis(r)(i))
    // projected variance per kept axis equals its eigenvalue
    val out = Embeddings.transform(data, "vec", model)
    val (_, _, cov2) = Embeddings.covariance(out, "whitened", 2)
    for (r <- 0 until 2)
      assert(math.abs(cov2(r)(r) - full.eigenvalues(r)) < 1e-6,
        s"axis $r var ${cov2(r)(r)} vs λ ${full.eigenvalues(r)}")
  }

  test("float input vectors work and the fit is deterministic across runs") {
    val fdf = vecs(2000).zipWithIndex
      .map { case (v, i) => (i.toLong, v.map(_.toFloat)) }
      .toDF("id", "vec")
    def fit() = Embeddings.fitWhitening(fdf, "vec", d, k = 3)
    val (m1, m2) = (fit(), fit())
    assert(m1.basis.flatten.toSeq == m2.basis.flatten.toSeq)
    assert(m1.eigenvalues.toSeq == m2.eigenvalues.toSeq)
    val p1 = Embeddings.transform(fdf, "vec", m1)
      .orderBy("id").limit(5)
      .select(col("whitened")).collect().map(_.getSeq[Double](0))
    assert(p1.forall(_.length == 3))
  }
}
