package graft

import java.nio.file.Files

import org.scalatest.funsuite.AnyFunSuite

import graft.functions.{HashingEmbedder, LinearQualityModel}

/** The model-based quality-filter slot: a linear model over the shared hashed
  * feature space separates "good" from "bad" text when its weights point at
  * the good direction; the file loader round-trips and digests artifacts.
  */
class LinearQualityModelSpec extends AnyFunSuite with SparkSuite {

  private val goodText = "a thoughtful well written paragraph about distributed systems"
  private val badText = "buy now click here buy now click here buy now"

  /** Weights = φ(good) − φ(bad): positive margin on good, negative on bad. */
  private def separatingWeights(dim: Int): Array[Float] = {
    val e = new HashingEmbedder(dim)
    val g = e.embed(goodText); val b = e.embed(badText)
    g.zip(b).map { case (x, y) => x - y }
  }

  test("separating weights rank good text above threshold, bad below") {
    val m = LinearQualityModel.fromWeights(0.0, separatingWeights(64))
    assert(m.score(goodText) > 0.6)
    assert(m.score(badText) < 0.4)
    assert(m.score(goodText) > m.score("irrelevant neutral words entirely"))
  }

  test("file round-trip: bias line + weights, comments skipped, digest in name") {
    val w = separatingWeights(64)
    val f = Files.createTempFile("graft-quality", ".txt")
    Files.writeString(f,
      "# linear quality model v1\n0.25\n" + w.mkString("\n"))
    val m = LinearQualityModel.fromFile(f.toString)
    assert(m.dim === 64)
    assert(m.name.startsWith("linear-quality-64-42-"))
    // same input, same score as the in-memory model with the same bias
    val mem = LinearQualityModel.fromWeights(0.25, w)
    assert(math.abs(m.score(goodText) - mem.score(goodText)) < 1e-12)
    // a different artifact gets a different identity
    val f2 = Files.createTempFile("graft-quality", ".txt")
    Files.writeString(f2, "0.5\n" + w.mkString("\n"))
    assert(LinearQualityModel.fromFile(f2.toString).name !== m.name)
  }

  test("filterByQuality keeps high scorers in a DataFrame pass") {
    import spark.implicits._
    val m = LinearQualityModel.fromWeights(0.0, separatingWeights(64))
    val df = Seq((1L, goodText), (2L, badText)).toDF("id", "text")
    val kept = m.filterByQuality(df, "text", 0.5).collect()
    assert(kept.map(_.getLong(0)).toSeq === Seq(1L))
    assert(kept.head.getAs[Double]("model_quality") > 0.5)
  }
}
