package graft.operators

import graft.functions.Embedder
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Search-relevance evaluation: MRR and recall@k over a labeled query set —
  * the harness that makes an embedder slot TRUSTWORTHY rather than merely
  * pluggable. The reference ships no relevance tests at all (its `tests/`
  * cover only indexer mechanics, tests/indexes/indexers/test_chroma_indexer.py),
  * so swapping its sentence-transformers model for anything else is an act of
  * faith; here the swap is gated by a pinned MRR floor.
  *
  * Scale shape: ranked results join labels on (query, doc) — both sides keyed
  * the same, label sets are metadata-sized and broadcast; the per-query
  * reduction is one hash aggregate. Evaluating E embedders × Q queries over an
  * N-doc corpus is E batch top-k scans (vectorTopKBatch broadcasts all Q query
  * vectors into ONE corpus pass each), never Q separate jobs.
  */
object RelevanceEval {

  /** Attach 1-based ranks per query from a score column.
    * `ascending = true` for distance-like scores (smaller is better).
    */
  def withRanks(scored: DataFrame, qidCol: String, idCol: String,
                scoreCol: String, ascending: Boolean): DataFrame = {
    val ord = if (ascending) col(scoreCol).asc else col(scoreCol).desc
    scored.withColumn("rank",
      row_number().over(Window.partitionBy(qidCol).orderBy(ord, col(idCol).asc))
        .cast("long"))
  }

  /** Per-query metrics from ranked results and relevance labels.
    *
    * `results`: (qidCol, idCol, rank) with rank 1-based, best first.
    * `labels`:  (qidCol, idCol) — one row per relevant document.
    *
    * Output per query: `rr` (reciprocal rank of the FIRST relevant hit, 0 if
    * none retrieved within k), `recall` (relevant retrieved in top-k /
    * relevant total), `n_relevant`. Queries appear even when nothing relevant
    * was retrieved — silent query drops would inflate every mean.
    */
  def perQuery(results: DataFrame, labels: DataFrame,
               qidCol: String, idCol: String, k: Int): DataFrame = {
    val hits = results.filter(col("rank") <= k)
      .join(labels.select(col(qidCol), col(idCol)), Seq(qidCol, idCol))
      .groupBy(qidCol)
      .agg(min("rank").as("_first"), count(lit(1)).as("_got"))
    labels.groupBy(qidCol).agg(count(lit(1)).as("n_relevant"))
      .join(hits, Seq(qidCol), "left")
      .select(col(qidCol),
        coalesce(lit(1.0) / col("_first"), lit(0.0)).as("rr"),
        (coalesce(col("_got"), lit(0L)) / col("n_relevant")).as("recall"),
        col("n_relevant"))
  }

  /** Aggregate a [[perQuery]] frame: (mrr, mean_recall, n_queries). */
  def summarize(perQueryDf: DataFrame): DataFrame =
    perQueryDf.agg(
      avg("rr").as("mrr"),
      avg("recall").as("mean_recall"),
      count(lit(1)).as("n_queries"))

  /** End-to-end embedder evaluation: embed corpus and queries with `embedder`,
    * run ONE batched cosine top-k pass (all query vectors broadcast into a
    * single corpus scan), rank, and score against `labels`.
    *
    * `corpus`: (idCol, textCol); `queries`: (qidCol, textCol);
    * `labels`: (qidCol, idCol).
    */
  def evaluateEmbedder(
      corpus: DataFrame, queries: DataFrame, labels: DataFrame,
      embedder: Embedder, qidCol: String, idCol: String, textCol: String,
      k: Int): DataFrame = {
    val embedUdf = udf((t: String) => embedder.embed(t))
    val corpusEmb = corpus.select(col(idCol), embedUdf(col(textCol)).as("_v"))
    val queryEmb = queries.select(col(qidCol), embedUdf(col(textCol)).as("_qv"))
    // vectorTopKBatch already emits a 1-based rank per query (negated
    // similarity, ascending = better) — feed it straight to the scorer
    val topk = Search.vectorTopKBatch(
      corpusEmb, "_v", idCol, queryEmb, qidCol, "_qv", k, "cosine")
    perQuery(topk, labels, qidCol, idCol, k)
  }
}
