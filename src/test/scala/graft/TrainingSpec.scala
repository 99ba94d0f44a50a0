package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.operators.Training

/** In-engine logistic-regression training: learns a separable rule, is
  * bit-deterministic across partitionings (the 9dp weight round), and the
  * one-aggregate-per-iteration contract holds.
  */
class TrainingSpec extends AnyFunSuite with SparkSuite {
  import spark.implicits._

  // y = 1 iff x is large — linearly separable with margin
  private def separable = Seq(
    (0.0, 0.0), (0.0, 0.1), (0.0, 0.2),
    (1.0, 0.8), (1.0, 0.9), (1.0, 1.0)).toDF("y", "x")

  test("learns the separable rule: positive weight, perfect accuracy") {
    val df = separable
    val m = Training.logRegGD(df, "y", Seq("x"), iters = 5, lr = 1.0)
    assert(m.n === 6)
    assert(m.weights.head > 0, s"x must get positive weight, got ${m.weights}")
    assert(Training.accuracy(df, "y", m) === 1.0)
  }

  test("training is partition-invariant bit for bit") {
    val a = Training.logRegGD(separable, "y", Seq("x"), iters = 3, lr = 0.5)
    val b = Training.logRegGD(separable.repartition(13), "y", Seq("x"), iters = 3, lr = 0.5)
    assert(a.bias === b.bias)
    assert(a.weights === b.weights)
  }

  test("a zero-information feature keeps weight at the label-prior pull only") {
    // x carries no signal (constant): its weight must equal bias's trajectory
    // scaled by the constant — with x = 1 everywhere, w and bias see the SAME
    // gradient, so they stay equal at every round
    val df = Seq((0.0, 1.0), (1.0, 1.0), (0.0, 1.0), (1.0, 1.0)).toDF("y", "x")
    val m = Training.logRegGD(df, "y", Seq("x"), iters = 4, lr = 0.5)
    assert(m.bias === m.weights.head)
  }

  test("multi-feature model prefers the informative feature") {
    val rnd = new scala.util.Random(7L)
    val rows = (0 until 200).map { i =>
      val y = i % 2
      // x1 tracks the label; x2 is noise
      (y.toDouble, y * 0.8 + 0.1, rnd.nextDouble())
    }
    val df = rows.toDF("y", "x1", "x2")
    val m = Training.logRegGD(df, "y", Seq("x1", "x2"), iters = 10, lr = 1.0)
    assert(m.weights(0) > math.abs(m.weights(1)),
      s"informative feature must dominate: ${m.weights}")
    assert(Training.accuracy(df, "y", m) === 1.0)
  }

  test("empty input fails loud") {
    val df = Seq.empty[(Double, Double)].toDF("y", "x")
    val e = intercept[IllegalArgumentException](
      Training.logRegGD(df, "y", Seq("x")))
    assert(e.getMessage.contains("empty"))
  }

  private def kmeansInit(rows: Seq[(Long, Seq[Float])]) = {
    val vecs = rows.toDF("id", "v")
    val init = vecs.filter(org.apache.spark.sql.functions.col("id") <= 1)
      .select(org.apache.spark.sql.functions.col("id").as("cid"),
        org.apache.spark.sql.functions.posexplode(
          org.apache.spark.sql.functions.col("v")).as(Seq("dim", "cval")))
    (vecs, init)
  }

  test("kMeansLloyd: converges to the two cluster means, hand-checked") {
    // seeds at (0,0) [cid 0] and (10,0) [cid 1]; true means (0,1) and (10,1)
    val (vecs, init) = kmeansInit(Seq(
      (0L, Seq(0f, 0f)), (1L, Seq(10f, 0f)),
      (2L, Seq(0f, 2f)), (3L, Seq(10f, 2f))))
    val cent = Training.kMeansLloyd(vecs, "id", "v", init, iters = 2)
      .collect().map(r => (r.getAs[Long]("cid"), r.getAs[Int]("dim")) ->
        r.getAs[Double]("cval")).toMap
    assert(cent === Map((0L, 0) -> 0.0, (0L, 1) -> 1.0,
      (1L, 0) -> 10.0, (1L, 1) -> 1.0))
  }

  test("kMeansLloyd: a cluster that captures nothing keeps its centroid") {
    val vecs = Seq(
      (0L, Seq(0f, 0f)), (1L, Seq(100f, 100f)),
      (2L, Seq(1f, 0f)), (3L, Seq(0f, 1f))).toDF("id", "v")
    // cid 0 seeded in the data mass, cid 1 seeded far away at (100,100) —
    // but id 1 sits ON that seed, so move it: seed cid 1 at (500,500) instead
    val init = Seq((0L, 0, 0.0), (0L, 1, 0.0), (1L, 0, 500.0), (1L, 1, 500.0))
      .toDF("cid", "dim", "cval")
    val cent = Training.kMeansLloyd(
        vecs.filter(org.apache.spark.sql.functions.col("id") =!= 1L),
        "id", "v", init, iters = 3)
      .collect().map(r => (r.getAs[Long]("cid"), r.getAs[Int]("dim")) ->
        r.getAs[Double]("cval")).toMap
    // cid 1 captured nothing in any round: centroid unchanged
    assert(cent((1L, 0)) === 500.0 && cent((1L, 1)) === 500.0)
    // cid 0 is the mean of (0,0),(1,0),(0,1)
    assert(math.abs(cent((0L, 0)) - 1.0 / 3) < 1e-9)
    assert(math.abs(cent((0L, 1)) - 1.0 / 3) < 1e-9)
  }

  test("kMeansLloyd: partition-invariant (1 vs 8 partitions)") {
    val rows = (0L to 40L).map(i => (i, Seq((i % 7).toFloat, (i % 5).toFloat)))
    val (vecs, init) = kmeansInit(rows)
    def run(parts: Int) = Training.kMeansLloyd(
        vecs.repartition(parts), "id", "v", init, iters = 3)
      .collect().map(r => (r.getAs[Long]("cid"), r.getAs[Int]("dim")) ->
        r.getAs[Double]("cval")).toMap
    assert(run(1) === run(8))
  }
}
