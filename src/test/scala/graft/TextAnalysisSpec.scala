package graft

import org.apache.spark.sql.functions.col
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.TextAnalysis

/** Readability signals (most TextAnalysis operators are oracle-gated via
  * Verify; readability's hand-computable arithmetic gets a unit pin too).
  */
class TextAnalysisSpec extends AnyFunSuite with SparkSuite {
  import spark.implicits._

  test("flesch scores match the hand computation") {
    val df = Seq((1L, "the cat sat. a dog ran!")).toDF("doc_id", "text")
    val r = TextAnalysis.readability(df, "text").head()
    assert(r.getAs[Long]("n_words") === 6)
    assert(r.getAs[Long]("n_syllables") === 6)
    assert(r.getAs[Long]("n_sentences_r") === 2)
    // 206.835 − 1.015·(6/2) − 84.6·(6/6)
    assert(r.getAs[Double]("flesch_ease") === 119.19)
    // 0.39·3 + 11.8·1 − 15.59
    assert(r.getAs[Double]("fk_grade") === -2.62)
  }

  test("syllable heuristic counts vowel groups, not vowels") {
    val df = Seq((1L, "beautiful queueing rhythm")).toDF("doc_id", "text")
    val r = TextAnalysis.readability(df, "text").head()
    // beautiful: eau|i|u = 3; queueing: ueuei = 1; rhythm: y = 1
    assert(r.getAs[Long]("n_syllables") === 5)
  }

  test("punctuation-free text reads as one sentence; empty text is safe") {
    val df = Seq((1L, "no terminal punctuation here"), (2L, "")).toDF("doc_id", "text")
    val rows = TextAnalysis.readability(df, "text")
      .collect().map(r => r.getAs[Long]("doc_id") -> r).toMap
    assert(rows(1L).getAs[Long]("n_sentences_r") === 1)
    assert(rows(2L).getAs[Long]("n_words") === 0)
    assert(!rows(2L).isNullAt(rows(2L).fieldIndex("flesch_ease")),
      "empty text must not divide by zero")
  }

  // ------------------------------------------------------------- token drift

  test("tokenDrift: identical slices diverge by zero on every token") {
    val docs = Seq((1L, "alpha beta gamma", true), (2L, "alpha beta gamma", false))
      .toDF("doc_id", "text", "a")
    val out = TextAnalysis.tokenDrift(docs, "text", col("a")).collect()
    assert(out.length === 3)
    assert(out.forall(_.getAs[Double]("js_contrib") === 0.0))
  }

  test("tokenDrift: a slice-exclusive token carries positive contribution") {
    val docs = Seq(
      (1L, "shared shared onlyleft", true),
      (2L, "shared shared onlyright", false)).toDF("doc_id", "text", "a")
    val rows = TextAnalysis.tokenDrift(docs, "text", col("a"))
      .collect().map(r => r.getAs[String]("token") -> r).toMap
    assert(rows("onlyleft").getAs[Double]("js_contrib") > 0.0)
    assert(rows("onlyleft").getAs[Double]("q") === 0.0)
    assert(rows("onlyright").getAs[Double]("p") === 0.0)
    // balanced slices: the exclusive tokens contribute symmetrically
    assert(rows("onlyleft").getAs[Double]("js_contrib") ===
      rows("onlyright").getAs[Double]("js_contrib"))
    assert(rows("shared").getAs[Double]("js_contrib") === 0.0)
  }
}
