package graft

import graft.operators.Pca
import org.apache.spark.sql.functions._

/** Distributed PCA (q160–q162): exact quantized moments, driver
  * eigen-solve, scan-speed projection. */
class PcaSpec extends GraftSpec {
  import spark.implicits._

  lazy val emb = spark.read.parquet(s"$sf001/embeddings.parquet").cache()

  test("covariance matches the quantized closed form on crafted vectors") {
    // two perfectly correlated dims and one constant dim
    val vecs = Seq(
      (0L, Seq(1.0f, 2.0f, 5.0f)),
      (1L, Seq(2.0f, 4.0f, 5.0f)),
      (2L, Seq(3.0f, 6.0f, 5.0f)),
      (3L, Seq(4.0f, 8.0f, 5.0f))).toDF("vec_id", "embedding")
    val cov = Pca.covariance(vecs, 3).collect()
      .map(r => ((r.getInt(0), r.getInt(1)), r.getDouble(2))).toMap
    // population covariance of [1,2,3,4] is 1.25; cov(x,2x)=2.5, var(2x)=5
    assert(cov((0, 0)) == 1.25 && cov((0, 1)) == 2.5 && cov((1, 1)) == 5.0)
    assert(cov((2, 2)) == 0.0 && cov((0, 2)) == 0.0 && cov((1, 2)) == 0.0)
  }

  test("moments are partition-invariant (exact integer sums)") {
    val a = Pca.moments(emb.repartition(1), 64).collect()
      .map(r => ((r.getInt(0), r.getInt(1)),
        (r.getDecimal(2), r.getDecimal(3), r.getLong(4)))).toMap
    val b = Pca.moments(emb.repartition(13), 64).collect()
      .map(r => ((r.getInt(0), r.getInt(1)),
        (r.getDecimal(2), r.getDecimal(3), r.getLong(4)))).toMap
    assert(a == b)
  }

  test("topEigen recovers a diagonal matrix's spectrum in order") {
    val c = Array.tabulate(4, 4)((i, j) =>
      if (i == j) Seq(3.0, 7.0, 1.0, 5.0)(i) else 0.0)
    val eig = Pca.topEigen(c, k = 3, iters = 60)
    assert(eig.map(_._1).zip(Seq(7.0, 5.0, 3.0)).forall {
      case (got, want) => math.abs(got - want) < 1e-9 })
    // leading eigenvector is the e_1 axis (up to sign)
    val v0 = eig.head._2
    assert(math.abs(math.abs(v0(1)) - 1.0) < 1e-9 &&
      math.abs(v0(0)) < 1e-9 && math.abs(v0(2)) < 1e-9)
  }

  test("directions are orthonormal BY CONSTRUCTION even on the near-isotropic spectrum") {
    val (_, _, cov) = Pca.model(emb, 64)
    val eig = Pca.topEigen(cov, k = 4)
    val vs = eig.map(_._2)
    for (a <- vs.indices; b <- a until vs.size) {
      val dot = (0 until 64).map(i => vs(a)(i) * vs(b)(i)).sum
      if (a == b) assert(math.abs(dot - 1.0) < 1e-9)
      else assert(math.abs(dot) < 1e-9, s"v$a . v$b = $dot")
    }
    // Rayleigh quotients: positive, bounded by the trace, roughly
    // descending (strict order is not guaranteed at lambda2/lambda1
    // ~ 0.99 — that near-tie is exactly why the GS-per-round form
    // exists)
    val ls = eig.map(_._1)
    val trace = (0 until 64).map(i => cov(i)(i)).sum
    assert(ls.forall(l => l > 0 && l <= trace))
    assert(ls.zip(ls.tail).forall { case (a, b) => b <= a + 1e-3 }, s"$ls")
  }

  test("projection matches a driver-side replay and variance tracks lambda") {
    val (_, means, cov) = Pca.model(emb, 64)
    val eig = Pca.topEigen(cov, k = 2)
    val got = Pca.project(emb, 64, k = 2).orderBy("vec_id").collect()
      .map(r => (r.getLong(0), r.getDouble(1), r.getDouble(2)))
    val raw = emb.orderBy("vec_id")
      .select(col("vec_id"), col("embedding")).collect()
      .map(r => (r.getLong(0), r.getSeq[Float](1)))
    def r6(x: Double) = BigDecimal(x * 1000000.0)
      .setScale(0, BigDecimal.RoundingMode.HALF_UP).toDouble / 1000000.0
    raw.zip(got).foreach { case ((id, e), (gid, p0, p1)) =>
      assert(id == gid)
      val q = e.map(x => math.round(x.toDouble * 10000.0).toDouble / 10000.0)
      Seq(p0, p1).zip(eig).foreach { case (pg, (_, v)) =>
        val z = (0 until 64).map(i => v(i) * (q(i) - means(i))).sum
        assert(math.abs(pg - r6(z)) < 2e-6, s"vec $id")
      }
    }
    // sample variance of the first projection approximates lambda0
    val p0s = got.map(_._2)
    val mu = p0s.sum / p0s.length
    val variance = p0s.map(x => (x - mu) * (x - mu)).sum / p0s.length
    assert(math.abs(variance - eig.head._1) / eig.head._1 < 0.05,
      s"var $variance vs lambda ${eig.head._1}")
  }
}
