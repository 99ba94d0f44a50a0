package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Maximal Marginal Relevance re-ranking (Carbonell & Goldstein, "The use of
  * MMR, diversity-based reranking for reordering documents and producing
  * summaries", SIGIR 1998) — the diversity pass a retrieval stack runs over
  * its ANN shortlist so the user doesn't get five near-identical chunks:
  * greedily pick argmax λ·sim(query, c) − (1−λ)·max_{p∈picked} sim(c, p).
  *
  * Scale shape: the shortlist is MODEL-sized by contract (top-k of an ANN
  * stage — tens of rows), so the greedy loop is legitimate driver work, like
  * [[Training.logRegGD]]'s weight vector. The inputs it selects over are
  * engine-computed and 6dp-rounded: query sims come in from the caller's
  * top-k stage, pairwise sims from one tiny cross join through the SAME
  * codegen'd cosine used everywhere — so the greedy arithmetic runs on
  * values a DuckDB oracle reproduces exactly, and the selection sequence is
  * bit-deterministic (strict-improvement argmax, ties to the smallest id).
  * Reference anchor: the RRF fusion stage this composes with
  * (`main/core/documents_collection_searcher.py:96-105`).
  */
object Mmr {

  /** Re-rank a shortlist: `shortlist` must carry (idCol: castable to long,
    * simCol: 6dp-rounded query similarity, vecCol: the embedding). Returns
    * (pick_rank, <idCol>, mmr_score) for the first `k` picks; the first
    * pick's score is λ·sim (empty-set diversity term = 0).
    */
  def rerank(shortlist: DataFrame, idCol: String, simCol: String, vecCol: String,
             k: Int, lam: Double = 0.7): DataFrame = {
    require(k >= 1 && lam >= 0 && lam <= 1)
    val spark = shortlist.sparkSession
    import spark.implicits._
    val sl = shortlist.select(col(idCol).cast("long").as("id"),
        col(simCol).cast("double").as("qs"), col(vecCol).as("v"))
      .localCheckpoint() // tiny by contract; read twice (sims + pairs)
    val qs = sl.select("id", "qs").collect()
      .map(r => r.getLong(0) -> r.getDouble(1)).toMap
    val ps = sl.as("a").crossJoin(sl.as("b"))
      .filter(col("a.id") < col("b.id"))
      .select(col("a.id").as("ai"), col("b.id").as("bi"),
        round(graft.plans.VectorFunctions.cosineF(col("a.v"), col("b.v")), 6).as("ps"))
      .collect().flatMap { r =>
        val v = r.getDouble(2)
        Seq((r.getLong(0), r.getLong(1)) -> v, (r.getLong(1), r.getLong(0)) -> v)
      }.toMap
    val picked = scala.collection.mutable.ArrayBuffer.empty[(Long, Double)]
    val remaining = scala.collection.mutable.SortedSet.from(qs.keys)
    while (picked.length < math.min(k, qs.size)) {
      // ascending-id scan with strict improvement = argmax with ties to the
      // smallest id — the exact ORDER BY sc DESC, id semantics of the oracle
      var bestId = -1L; var bestSc = Double.NegativeInfinity
      remaining.foreach { id =>
        val div = if (picked.isEmpty) 0.0
          else picked.iterator.map(p => ps((id, p._1))).max
        val sc = lam * qs(id) - (1.0 - lam) * div
        if (sc > bestSc) { bestSc = sc; bestId = id }
      }
      picked += ((bestId, bestSc))
      remaining -= bestId
    }
    picked.zipWithIndex
      .map { case ((id, sc), i) => (i + 1, id, sc) }.toSeq
      .toDF("pick_rank", "id", "raw")
      .select(col("pick_rank"), col("id").as(idCol),
        round(col("raw"), 6).as("mmr_score"))
  }
}
