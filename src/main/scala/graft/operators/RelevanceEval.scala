package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Retrieval-quality metrics — MRR and recall@k of a ranked result set against
  * a labeled relevance table. The reference ships no relevance harness at all
  * (its tests cover only indexer mechanics, tests/indexes/indexers/
  * test_chroma_indexer.py); this operator is what makes an embedder slot
  * TRUSTWORTHY: swap in a new model, rerun the gate, read one number.
  *
  * Both metrics are standard IR definitions:
  *   - reciprocal rank = 1 / rank of the FIRST relevant doc within the top-k
  *     (0 when none retrieved); MRR = mean over queries.
  *   - recall@k = |retrieved@k ∩ relevant| / |relevant|.
  *
  * Shape at scale: the labels table joins the rank-truncated results on
  * (query, doc) — results@k is queries × k rows no matter the corpus size, so
  * every aggregate here is metadata-sized next to the retrieval that produced
  * it. Queries with NO labeled relevant docs are excluded by construction
  * (they contribute no label rows — standard TREC convention) rather than
  * scoring as 0, so an unjudged query can't drag the mean.
  */
object RelevanceEval {

  /** Per-query metrics. `results` carries one row per (query, retrieved doc)
    * with a 1-based `rankCol`; `labels` carries one row per (query, relevant
    * doc). Returns (queryCol, rr, n_hits, n_relevant, recall) — one row per
    * labeled query, including zero rows for queries whose top-k missed
    * everything (left join from labels, not from hits).
    */
  def perQuery(results: DataFrame, labels: DataFrame, queryCol: String,
               docCol: String, rankCol: String, k: Int): DataFrame = {
    require(k > 0, "k must be positive")
    val nRel = labels.groupBy(queryCol).agg(count(lit(1)).as("n_relevant"))
    val hits = results.filter(col(rankCol) <= k)
      .join(labels, Seq(queryCol, docCol))
      .groupBy(queryCol)
      .agg(min(col(rankCol)).as("_first"), count(lit(1)).as("n_hits"))
    nRel.join(hits, Seq(queryCol), "left")
      .select(col(queryCol),
        coalesce(lit(1.0) / col("_first"), lit(0.0)).as("rr"),
        coalesce(col("n_hits"), lit(0L)).as("n_hits"),
        col("n_relevant"),
        (coalesce(col("n_hits"), lit(0L)).cast("double") /
          // a query can have fewer than k relevant docs; recall@k caps the
          // denominator at k so a fully-satisfied query scores 1.0
          least(col("n_relevant"), lit(k.toLong)).cast("double")).as("recall"))
  }

  /** One-row summary: MRR, mean recall@k, and the labeled-query count the
    * means average over (so a silent label-coverage collapse is visible).
    */
  def summarize(perQueryMetrics: DataFrame): DataFrame =
    perQueryMetrics.agg(
      avg("rr").as("mrr"),
      avg("recall").as("mean_recall"),
      count(lit(1)).as("n_queries"))
}
