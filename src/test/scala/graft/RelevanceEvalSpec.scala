package graft

import java.nio.file.Files

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.functions.{HashingEmbedder, WordVectorEmbedder}
import graft.operators.{RelevanceEval, Search}

/** The relevance gate the reference never had: a labeled fixture (queries →
  * relevant doc ids) scored with MRR / recall@k over every retrieval path —
  * hashing embedder, file-backed word-vector embedder, BM25, and their RRF
  * fusion. Floors are pinned so an embedder or fusion regression fails loud;
  * the fixture deliberately includes a query that is OOV for the word-vector
  * artifact but exact-match for BM25, proving fusion recovers what a single
  * system drops.
  */
class RelevanceEvalSpec extends AnyFunSuite with SparkSuite {
  import spark.implicits._

  // --- labeled corpus: three disjoint-vocabulary topics, 4 docs each -------
  private val docs = Seq(
    (1L, "animals", "the cat and the dog chase the kitten"),
    (2L, "animals", "a puppy and a kitten share soft fur"),
    (3L, "animals", "the dog guards the cat with one paw"),
    (4L, "animals", "fur and paw and puppy and cat"),
    (5L, "infra", "the server runs the deploy for the cluster"),
    (6L, "infra", "a shard on each node in the container"),
    (7L, "infra", "deploy the container to the cluster node"),
    (8L, "infra", "server shard cluster deploy node"),
    (9L, "cooking", "bake the dough in the oven with yeast"),
    (10L, "cooking", "knead the flour into dough and simmer the saucepan"),
    (11L, "cooking", "flour and yeast make the dough rise"),
    (12L, "cooking", "bake and knead with flour in the oven"))

  private val queries = Seq(
    (101L, "animals", "cat kitten fur"),
    (102L, "animals", "dog paw"),
    (103L, "infra", "deploy cluster node"),
    (104L, "infra", "server shard"),
    (105L, "cooking", "bake dough oven"),
    // OOV for the word-vector artifact below; exact BM25 match on doc 10
    (106L, "cooking", "simmer saucepan"))

  private def labelDf: DataFrame =
    (for ((qid, topic, _) <- queries; (did, dt, _) <- docs if dt == topic)
      yield (qid, did)).toDF("qid", "docId")

  /** Topic-clustered 4-d vector file; 'simmer'/'saucepan' intentionally absent. */
  private def vectorFile: String = {
    val f = Files.createTempFile("graft-eval-vec", ".txt")
    val animal = Seq("cat", "dog", "kitten", "puppy", "fur", "paw", "chase", "guards", "share", "soft")
    val infra = Seq("server", "deploy", "cluster", "shard", "node", "container", "runs")
    val cooking = Seq("bake", "flour", "oven", "knead", "dough", "yeast", "make", "rise")
    val rows =
      animal.map(w => s"$w 0.9 0.1 0.0 0.0") ++
        infra.map(w => s"$w 0.0 0.0 0.9 0.1") ++
        cooking.map(w => s"$w 0.0 0.1 0.0 0.9")
    Files.writeString(f, rows.mkString("\n"))
    f.toString
  }

  /** Rank every query's cosine top-k through one embedder → (qid, docId, rank). */
  private def embedderResults(embed: String => Array[Float], k: Int): DataFrame = {
    val corpus = docs.map { case (id, _, text) => (id, embed(text).toSeq) }
      .toDF("docId", "embedding")
      .select(col("docId"), col("embedding").cast("array<float>").as("embedding"))
    queries.map { case (qid, _, qtext) =>
      Search.vectorTopK(corpus, "embedding", embed(qtext), k, "cosine", idCol = "docId")
        .select(lit(qid).as("qid"), col("docId"), col("score"))
        .withColumn("rank", row_number().over(
          org.apache.spark.sql.expressions.Window
            .partitionBy("qid").orderBy(col("score").asc, col("docId").asc)))
        .drop("score")
    }.reduce(_.unionByName(_))
  }

  /** Disjunctive BM25 per query → (qid, docId, rank). */
  private def bm25Results(k: Int): DataFrame = {
    val corpus = docs.map { case (id, _, text) => (id, text) }.toDF("id", "text")
    queries.map { case (qid, _, qtext) =>
      Search.bm25TopK(corpus, "id", "text", qtext, k, conjunctive = false)
        .select(lit(qid).as("qid"), col("docId"), col("score"))
        .withColumn("rank", row_number().over(
          org.apache.spark.sql.expressions.Window
            .partitionBy("qid").orderBy(col("score").desc, col("docId").asc)))
        .drop("score")
    }.reduce(_.unionByName(_))
  }

  /** RRF-fuse two (qid, docId, rank) result sets per query → fused ranks. */
  private def fuse(a: DataFrame, b: DataFrame, k: Int): DataFrame =
    queries.map { case (qid, _, _) =>
      Search.rrfFuse(
        Seq(a.filter(col("qid") === qid).drop("qid"),
          b.filter(col("qid") === qid).drop("qid")),
        "docId", "rank", ascending = Seq(true, true), topK = k)
        .select(lit(qid).as("qid"), col("docId"), col("rrfScore").as("score"))
        .withColumn("rank", row_number().over(
          org.apache.spark.sql.expressions.Window
            .partitionBy("qid").orderBy(col("score").desc, col("docId").asc)))
        .drop("score")
    }.reduce(_.unionByName(_))

  private def mrrAndRecall(results: DataFrame, k: Int): (Double, Double) = {
    val row = RelevanceEval.summarize(
      RelevanceEval.perQuery(results, labelDf, "qid", "docId", "rank", k)).head()
    (row.getAs[Double]("mrr"), row.getAs[Double]("mean_recall"))
  }

  test("perQuery/summarize match the hand computation") {
    val results = Seq(
      (1L, 10L, 1), (1L, 11L, 2), (1L, 12L, 3), // first relevant at rank 2
      (2L, 20L, 1), (2L, 21L, 2), (2L, 22L, 3)) // no relevant retrieved
      .toDF("qid", "docId", "rank")
    val labels = Seq((1L, 11L), (1L, 12L), (2L, 99L)).toDF("qid", "docId")
    val per = RelevanceEval.perQuery(results, labels, "qid", "docId", "rank", 3)
      .collect().map(r => r.getAs[Long]("qid") ->
        (r.getAs[Double]("rr"), r.getAs[Long]("n_hits"), r.getAs[Double]("recall"))).toMap
    assert(per(1L) === ((0.5, 2L, 1.0)))
    assert(per(2L) === ((0.0, 0L, 0.0)))
    val s = RelevanceEval.summarize(
      RelevanceEval.perQuery(results, labels, "qid", "docId", "rank", 3)).head()
    assert(math.abs(s.getAs[Double]("mrr") - 0.25) < 1e-12)
    assert(s.getAs[Long]("n_queries") === 2L)
  }

  test("a query with zero retrieved relevant docs still appears (rr=0), an unlabeled query does not") {
    val results = Seq((7L, 1L, 1)).toDF("qid", "docId", "rank")
    val labels = Seq((8L, 1L)).toDF("qid", "docId") // query 7 unlabeled, query 8 unretrieved
    val per = RelevanceEval.perQuery(results, labels, "qid", "docId", "rank", 5).collect()
    assert(per.map(_.getAs[Long]("qid")).toSeq === Seq(8L))
    assert(per.head.getAs[Double]("rr") === 0.0)
  }

  test("hashing embedder clears the pinned MRR floor on the labeled fixture") {
    val e = new HashingEmbedder(dim = 64)
    val (mrr, recall) = mrrAndRecall(embedderResults(e.embed, 5), 5)
    assert(mrr >= 0.9, s"hashing MRR regressed: $mrr")
    // the hashing embedder weighs stopwords like content words, so cross-topic
    // docs with heavy "the/and" mass crowd the top-5: recall@5 honestly sits
    // near 0.58 on this fixture. The pin is a regression tripwire at that
    // level, not a quality claim — the word-vector + fusion floors above 0.9
    // are where retrieval quality is actually asserted.
    assert(recall >= 0.55, s"hashing recall@5 regressed: $recall")
  }

  test("word-vector embedder aces in-vocabulary queries, drops the OOV one") {
    val e = WordVectorEmbedder.fromFile(vectorFile)
    val per = RelevanceEval.perQuery(
      embedderResults(e.embed, 5), labelDf, "qid", "docId", "rank", 5)
      .collect().map(r => r.getAs[Long]("qid") -> r.getAs[Double]("rr")).toMap
    (101L to 105L).foreach(q => assert(per(q) === 1.0, s"query $q rr=${per(q)}"))
    // 'simmer saucepan' embeds to the zero vector → cosine ties at 0 → the
    // id-ordered tie-break ranks doc 10 (the only truly relevant hit) 5th+
    assert(per(106L) < 1.0, "OOV query unexpectedly perfect — fixture broken")
  }

  test("BM25 nails the exact-match query the word-vector model misses") {
    val per = RelevanceEval.perQuery(
      bm25Results(5), labelDf, "qid", "docId", "rank", 5)
      .collect().map(r => r.getAs[Long]("qid") -> r.getAs[Double]("rr")).toMap
    assert(per(106L) === 1.0, s"BM25 should top-rank doc 10 for 'simmer saucepan', rr=${per(106L)}")
  }

  test("RRF fusion beats the word-vector system alone and clears the pinned floor") {
    val e = WordVectorEmbedder.fromFile(vectorFile)
    val wv = embedderResults(e.embed, 5)
    val bm = bm25Results(5)
    val (wvMrr, _) = mrrAndRecall(wv, 5)
    val (fusedMrr, fusedRecall) = mrrAndRecall(fuse(wv, bm, 5), 5)
    assert(fusedMrr > wvMrr,
      s"fusion ($fusedMrr) should recover the OOV query the embedder drops ($wvMrr)")
    assert(fusedMrr >= 0.9, s"fused MRR floor: $fusedMrr")
    assert(fusedRecall >= 0.8, s"fused recall@5 floor: $fusedRecall")
  }
}
