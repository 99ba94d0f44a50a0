package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Statistical-LM quality scoring for training-data curation: train an add-α
  * smoothed bigram model over a corpus and score each document by its average
  * negative log-likelihood (and perplexity) under that model — the CCNet
  * recipe (Wenzek et al., "CCNet: Extracting High Quality Monolingual
  * Datasets from Web Crawl Data", arXiv:1911.00359) with the corpus itself as
  * training text; [[scoreAgainst]] takes an external model for the
  * train-on-Wikipedia / score-the-crawl split.
  *
  * Extension beyond the reference's surface (its text processing stops at
  * clean/split/embed — /root/reference/main/splitter/text_splitter.py); LM
  * perplexity is the standard third curation axis next to the heuristic
  * signals (TextAnalysis) and the linear classifier (LinearQualityModel).
  *
  * 100 TB posture: the model is two aggregates over token pairs (map-side
  * combined; result bounded by min(distinct bigrams, V²), NOT corpus size);
  * the vocabulary is a top-V TakeOrdered broadcast (V ~ thousands); scoring
  * is one shuffle equi-join on the bigram key plus a broadcast join of the
  * ≤V+1-row left-marginal table. No corpus-sized exchange anywhere, nothing
  * driver-side except the V-row vocabulary count.
  */
object LanguageModel {

  /** Out-of-vocabulary token. Lowercase-alnum tokenization keeps it collision-free. */
  val unk = "<unk>"

  /** Shared tokenizer — identical to TextAnalysis/corpus oracles so all text
    * operators agree on what a token is.
    */
  private def toksExpr(textCol: String): String =
    s"filter(split(lower($textCol), '[^a-z0-9]+'), t -> t != '')"

  /** The trained model: `vocab` (top-V tokens), `bigrams` (w1, w2, c_bg),
    * `vocabSizeWithUnk` = |vocab| + 1, the smoothing denominator's V.
    */
  final case class BigramModel(vocab: DataFrame, bigrams: DataFrame,
                               vocabSizeWithUnk: Long, alpha: Double)

  /** Consecutive-pair rows (idCol, w1, w2) with OOV mapped to [[unk]] via two
    * broadcast joins against the vocabulary (per-row map otherwise — explode
    * is narrow, no shuffle).
    */
  private def bigramRows(docs: DataFrame, idCol: String, textCol: String,
                         vocab: DataFrame): DataFrame = {
    val pairs = docs
      .withColumn("_ts", expr(toksExpr(textCol)))
      .withColumn("_n", size(col("_ts")))
      .where(col("_n") >= 2)
      .select(col(idCol), explode(expr(
        "transform(sequence(1, _n - 1), i -> struct(_ts[i-1] AS w1, _ts[i] AS w2))")).as("bg"))
      .select(col(idCol), col("bg.w1").as("w1r"), col("bg.w2").as("w2r"))
    val v1 = broadcast(vocab.select(col("tok").as("w1r"), lit(true).as("_in1")))
    val v2 = broadcast(vocab.select(col("tok").as("w2r"), lit(true).as("_in2")))
    pairs
      .join(v1, Seq("w1r"), "left").join(v2, Seq("w2r"), "left")
      .select(col(idCol),
        when(col("_in1"), col("w1r")).otherwise(lit(unk)).as("w1"),
        when(col("_in2"), col("w2r")).otherwise(lit(unk)).as("w2"))
  }

  /** Train on `docs`: top-`vocabSize` tokens by count (ties broken by token
    * order, so the cut is deterministic), then bigram counts over the
    * unk-mapped pair stream.
    */
  def train(docs: DataFrame, idCol: String, textCol: String,
            vocabSize: Int = 4096, alpha: Double = 0.1): BigramModel = {
    val tokRows = docs.select(explode(expr(toksExpr(textCol))).as("tok"))
    val vocab = tokRows.groupBy("tok").agg(count(lit(1)).as("c"))
      .orderBy(col("c").desc, col("tok").asc).limit(vocabSize)
      .select("tok")
    val bigrams = bigramRows(docs, idCol, textCol, vocab)
      .groupBy("w1", "w2").agg(count(lit(1)).as("c_bg"))
    BigramModel(vocab, bigrams, vocab.count() + 1, alpha)
  }

  /** Score `docs` under `model`: per document, the mean over its bigrams of
    * −ln p(w2|w1) with p = (c(w1,w2) + α) / (c(w1·) + α·(V+1)), plus
    * perplexity e^mean. Documents with < 2 tokens score null (no evidence —
    * callers decide; CCNet buckets by perplexity, so null ≠ bad).
    * Output: idCol, n_bigrams, avg_nll (round 6), ppl (round 4 of e^rounded).
    */
  def scoreAgainst(docs: DataFrame, idCol: String, textCol: String,
                   model: BigramModel): DataFrame = {
    val marg = model.bigrams.groupBy("w1").agg(sum("c_bg").as("c_left"))
    val denomAdd = lit(model.alpha * model.vocabSizeWithUnk)
    val scored = bigramRows(docs, idCol, textCol, model.vocab)
      .join(model.bigrams, Seq("w1", "w2"), "left")
      .join(broadcast(marg), Seq("w1"), "left")
      .withColumn("nll", -log(
        (coalesce(col("c_bg"), lit(0L)) + lit(model.alpha)) /
          (coalesce(col("c_left"), lit(0L)) + denomAdd)))
    val agg = scored.groupBy(col(idCol))
      .agg(count(lit(1)).as("n_bigrams"), avg("nll").as("_avg"))
    docs.select(col(idCol))
      .join(agg, Seq(idCol), "left")
      .select(col(idCol),
        coalesce(col("n_bigrams"), lit(0L)).as("n_bigrams"),
        round(col("_avg"), 6).as("avg_nll"),
        round(exp(round(col("_avg"), 6)), 4).as("ppl"))
  }

  /** Train-and-score on the same corpus (the self-scoring instance the
    * `text_lm_perplexity` oracle gates end to end).
    */
  def bigramPerplexity(docs: DataFrame, idCol: String, textCol: String,
                       vocabSize: Int = 4096, alpha: Double = 0.1): DataFrame =
    scoreAgainst(docs, idCol, textCol, train(docs, idCol, textCol, vocabSize, alpha))
}
