package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.operators.LanguageModel

/** Bigram-LM perplexity: hand-computed probabilities on a toy corpus, the
  * top-V vocabulary cut with OOV→unk, the no-evidence (<2 tokens) null path,
  * and external-model scoring of unseen bigrams (the smoothing floor).
  */
class LanguageModelSpec extends AnyFunSuite with SparkSuite {

  private def docs(rows: (Long, String)*) = {
    import spark.implicits._
    rows.toDF("doc_id", "text")
  }

  test("bigramPerplexity matches hand-computed add-alpha bigram math") {
    val df = docs(1L -> "a b a b", 2L -> "a b c", 3L -> "x")
    val out = LanguageModel.bigramPerplexity(df, "doc_id", "text")
      .collect().map(r => r.getLong(0) ->
        ((r.getLong(1), Option(r.get(2)).map(_.asInstanceOf[Double])))).toMap

    // corpus bigrams: (a,b):3  (b,a):1  (b,c):1; left-marginals: a·=3, b·=2
    // vocab {a,b,c,x} → V+1 = 5, α = 0.1 → denominator add = 0.5
    val pBA = 3.1 / 3.5; val pAB = 1.1 / 2.5; val pCB = 1.1 / 2.5
    val d1 = -(2 * math.log(pBA) + math.log(pAB)) / 3
    val d2 = -(math.log(pBA) + math.log(pCB)) / 2
    assert(out(1L)._1 === 3L)
    assert(math.abs(out(1L)._2.get - d1) < 1e-6)
    assert(out(2L) === ((2L, Some(BigDecimal(d2).setScale(6,
      BigDecimal.RoundingMode.HALF_UP).toDouble))))
    assert(out(3L) === ((0L, None))) // one token: no bigrams, null score
  }

  test("vocabulary cut maps OOV to <unk> deterministically") {
    val df = docs(1L -> "a b a b", 2L -> "a b c", 3L -> "x")
    // unigrams: a:3 b:3 c:1 x:1 → top-2 is {a, b} (count desc, token asc)
    val model = LanguageModel.train(df, "doc_id", "text", vocabSize = 2)
    assert(model.vocab.collect().map(_.getString(0)).sorted === Array("a", "b"))
    assert(model.vocabSizeWithUnk === 3L)
    val bg = model.bigrams.collect()
      .map(r => (r.getString(0), r.getString(1)) -> r.getLong(2)).toMap
    assert(bg(("a", "b")) === 3L)
    assert(bg(("b", LanguageModel.unk)) === 1L) // (b,c) with c out of vocab
  }

  test("scoreAgainst an external model: unseen bigrams hit the smoothing floor") {
    val train = docs(1L -> "a b a b", 2L -> "a b c")
    val model = LanguageModel.train(train, "doc_id", "text", vocabSize = 100)
    // "b b" never occurs; b's marginal is 2, vocab {a,b,c} → V+1 = 4
    val scored = LanguageModel.scoreAgainst(
      docs(9L -> "b b"), "doc_id", "text", model).collect().head
    val expect = -math.log(0.1 / (2 + 0.1 * 4))
    assert(scored.getLong(1) === 1L)
    assert(math.abs(scored.getDouble(2) - expect) < 1e-6)
    // a doc of ONLY unseen tokens: both sides unk, c(unk,unk)=0, c(unk·)=0
    val floor = LanguageModel.scoreAgainst(
      docs(10L -> "zz qq"), "doc_id", "text", model).collect().head
    val expectFloor = -math.log(0.1 / (0 + 0.1 * 4))
    assert(math.abs(floor.getDouble(2) - expectFloor) < 1e-6)
  }

  test("deterministic: two runs return identical rows") {
    val df = docs((1L to 50L).map(i =>
      i -> s"tok${i % 7} tok${i % 5} tok${i % 3} tok${i % 7}"): _*)
    def run() = LanguageModel.bigramPerplexity(df, "doc_id", "text")
      .orderBy("doc_id").collect().toSeq.map(_.toString)
    assert(run() === run())
  }
}
