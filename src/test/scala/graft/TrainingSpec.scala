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
}
