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

  test("MLlib training → save → fromFile round-trip separates the classes") {
    import spark.implicits._
    // 40 labeled docs: prose-ish positives, repetitive-junk negatives
    val good = (1 to 20).map(i =>
      (s"a thoughtful analysis of topic $i covering methods results and open questions", 1))
    val junk = (1 to 20).map(i => (("spam buy now " * 8) + i, 0))
    val df = (good ++ junk).toDF("text", "label")
    val trained = LinearQualityModel.train(df, "text", "label", dim = 256, maxIter = 30)
    // separation on held-out-ish probes with the same vocabulary shape
    val sGood = trained.score("an analysis of methods and results with open questions")
    val sJunk = trained.score("spam buy now spam buy now spam buy now spam")
    assert(sGood > 0.7, s"good probe scored $sGood")
    assert(sJunk < 0.3, s"junk probe scored $sJunk")
    // the shipped artifact reproduces the trained scores bit-for-bit-ish
    val f = java.nio.file.Files.createTempFile("graft-trained", ".txt")
    trained.save(f.toString)
    val loaded = LinearQualityModel.fromFile(f.toString)
    assert(loaded.dim === 256)
    assert(math.abs(loaded.score(goodText) - trained.score(goodText)) < 1e-6)
    // and carries a content-digest identity distinct from the in-memory one
    assert(loaded.name !== trained.name)
  }
}
