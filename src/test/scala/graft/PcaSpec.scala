package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.operators.Pca

/** Covariance aggregator + power iteration: hand-computed moments, known
  * dominant eigenpair, partition invariance (the 9dp rounds).
  */
class PcaSpec extends AnyFunSuite with SparkSuite {
  import spark.implicits._

  test("covariance matches the hand computation on 2-d data") {
    // vectors (1,0),(0,1),(1,1),(0,0): mean (.5,.5), var .25 each, cov 0
    val df = Seq(Seq(1f, 0f), Seq(0f, 1f), Seq(1f, 1f), Seq(0f, 0f)).toDF("v")
    val got = Pca.covariance(df, "v", 2)
      .collect().map(r => (r.getInt(0), r.getInt(1)) -> r.getDouble(2)).toMap
    assert(got === Map((0, 0) -> 0.25, (0, 1) -> 0.0, (1, 0) -> 0.0, (1, 1) -> 0.25))
  }

  test("power iteration finds the known dominant eigenpair") {
    // zero-mean data along direction (3,1): cov = [[22.5,7.5],[7.5,2.5]],
    // dominant eigenvector (3,1)/sqrt(10), eigenvalue 25
    val df = Seq(Seq(3f, 1f), Seq(-3f, -1f), Seq(6f, 2f), Seq(-6f, -2f)).toDF("v")
    val cov = Pca.covariance(df, "v", 2)
    val v = Pca.topComponent(cov, 2, iters = 5)
      .collect().map(r => r.getInt(0) -> r.getDouble(1)).toMap
    assert(math.abs(v(0) / v(1) - 3.0) < 1e-6,
      s"loadings must align with (3,1): $v")
    assert(math.abs(math.hypot(v(0), v(1)) - 1.0) < 1e-8, "iterate must be unit")
    val lam = Pca.rayleigh(cov, Pca.topComponent(cov, 2, iters = 5))
      .head().getDouble(0)
    assert(math.abs(lam - 25.0) < 1e-6, s"eigenvalue must be 25, got $lam")
  }

  test("covariance is partition-invariant bit for bit") {
    val rnd = new scala.util.Random(11L)
    val data = Seq.fill(300)(Seq.fill(4)(rnd.nextFloat() * 2f - 1f))
    val a = Pca.covariance(data.toDF("v"), "v", 4)
      .collect().map(r => (r.getInt(0), r.getInt(1)) -> r.getDouble(2)).toMap
    val b = Pca.covariance(data.toDF("v").repartition(17), "v", 4)
      .collect().map(r => (r.getInt(0), r.getInt(1)) -> r.getDouble(2)).toMap
    assert(a === b)
  }

  test("dimension mismatch and empty input fail loud") {
    val bad = Seq(Seq(1f, 2f, 3f)).toDF("v")
    assertThrows[Exception](Pca.covariance(bad, "v", 2))
    val empty = Seq.empty[Seq[Float]].toDF("v")
    val e = intercept[IllegalArgumentException](Pca.covariance(empty, "v", 2))
    assert(e.getMessage.contains("empty"))
  }
}
