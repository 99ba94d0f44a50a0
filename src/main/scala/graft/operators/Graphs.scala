package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Iterative graph algorithms over edge tables — the authority/propagation
  * family a curation pipeline runs over provenance graphs (domain link
  * graphs for CommonCrawl-style quality weighting, citation graphs, the
  * customer↔supplier trade graph the gated query uses). Complements the
  * connected-components family in [[Dedup]] (label propagation there,
  * rank propagation here).
  *
  * Scale shape per iteration: one shuffle of the edge table keyed on `src`
  * (the rank join) and one keyed on `dst` (the contribution aggregate, map-
  * side combined) — the textbook Pregel exchange pattern, nothing funnels
  * through the driver. Rank state is one (node, double) row per node. At
  * 100 TB pre-partition the edges by `src` once (`repartition` or bucketing)
  * so every iteration reuses the layout instead of re-exchanging; callers
  * looping many iterations should also persist `edges` — the operator leaves
  * lineage lazy (the [[LanguageModel]] trade: a persist here could never be
  * unpersisted safely under the returned DataFrame).
  */
object Graphs {

  /** PageRank (Page et al., "The PageRank citation ranking", 1999) in the
    * classic unnormalized form: rank₀ = 1, rank' = (1−d) + d·Σ_in rank/outdeg
    * — nodes with no in-links settle at 1−d; dangling nodes contribute
    * nothing (their mass is not redistributed, the original Spark-example
    * semantics; document-level callers rarely care, normalize downstream if
    * they do).
    *
    * Each iteration's rank is rounded to 9 decimals: contribution sums are
    * order-dependent in their last ulp, so without the round two engines (or
    * two partitionings) could drift apart over iterations. 9dp is far below
    * any ranking signal and makes the whole fixed point bit-reproducible —
    * the same trick as [[Curation.weightedSample]]'s rounded sort key.
    *
    * Input: edge table with `src`, `dst` columns (any type; duplicate edges
    * are deduped). Output: (node, rank), one row per distinct endpoint.
    */
  def pageRank(edges: DataFrame, iters: Int = 5, damping: Double = 0.85): DataFrame = {
    require(iters >= 1, "need at least one iteration")
    // localCheckpoint truncates the edge lineage (the GraphX recipe): without
    // it every iteration re-derives the caller's whole edge plan — a join
    // tree upstream re-ran ~3× per round in the stress sweep (5.6 s → the
    // checkpoint pays it once). Eager by design; blocks are executor-local
    // and freed by the ContextCleaner once the result is dropped.
    val e = edges.select(col("src"), col("dst")).distinct().localCheckpoint()
    val outdeg = e.groupBy("src").agg(count(lit(1)).as("outdeg"))
    val nodes = e.select(col("src").as("node"))
      .union(e.select(col("dst").as("node"))).distinct()
    var ranks = nodes.withColumn("rank", lit(1.0))
    for (_ <- 1 to iters) {
      val contribs = e
        .join(ranks, e("src") === ranks("node"))
        .join(outdeg, "src")
        .select(col("dst").as("node"), (col("rank") / col("outdeg")).as("c"))
        .groupBy("node").agg(sum("c").as("in_sum"))
      ranks = nodes.join(contribs, Seq("node"), "left")
        .select(col("node"),
          round(lit(1.0 - damping) +
            lit(damping) * coalesce(col("in_sum"), lit(0.0)), 9).as("rank"))
    }
    ranks
  }
}
