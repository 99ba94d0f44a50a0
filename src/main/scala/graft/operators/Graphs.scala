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
    * — nodes with no in-links settle at 1−d. Dangling-node mass is governed
    * by `redistributeDangling`: false (default) drops it — the original
    * Spark-example semantics, fine for relative document ranking; true
    * spreads each round's dangling rank uniformly over all N nodes
    * (rank' = (1−d) + d·(Σ_in rank/outdeg + danglingSum/N)), the
    * stochastic-matrix form whose total mass stays exactly N — use it when
    * ranks feed a sampling weight and absolute mass matters. The dangling
    * sum is ONE extra scalar aggregate per round, broadcast back as a
    * one-row cross join (no driver collect).
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
  def pageRank(edges: DataFrame, iters: Int = 5, damping: Double = 0.85,
               redistributeDangling: Boolean = false): DataFrame = {
    require(iters >= 1, "need at least one iteration")
    // localCheckpoint truncates the edge lineage (the GraphX recipe): without
    // it every iteration re-derives the caller's whole edge plan — a join
    // tree upstream re-ran ~3× per round in the stress sweep (5.6 s → the
    // checkpoint pays it once). Eager by design; blocks are executor-local
    // and freed by the ContextCleaner once the result is dropped.
    // The out-degree folds INTO the checkpointed edge table so each
    // iteration is ONE join + one aggregate instead of two joins.
    // Partitioned by dst BEFORE the checkpoint: each iteration's contribution
    // aggregate groups on dst (as `node`), the rank side of the per-iteration
    // join is node-count-sized (AQE broadcasts it, preserving the probe
    // side's layout through the alias-aware projection), so the aggregate
    // reuses this one layout every round — the per-iteration wide exchange of
    // the edge table disappears from the plan.
    // Partition by dst FIRST: hash(dst) satisfies the (src, dst) clustering
    // the distinct needs (dst ⊆ {src, dst}), so the dedup aggregate runs
    // exchange-free on the already-partitioned rows — one full edge-table
    // exchange instead of the former distinct-then-repartition two (guide
    // §2.4 "two operations keyed the same way can share one exchange").
    // The node-sized outdeg side broadcasts (the same AQE-broadcast
    // assumption every ITERATION below already leans on), so the dst layout
    // survives through the join into the checkpoint.
    val dedup = edges.select(col("src"), col("dst"))
      .repartition(col("dst"))
      .distinct()
    val e = dedup
      .join(dedup.groupBy("src").agg(count(lit(1)).as("outdeg")), "src")
      .localCheckpoint()
    // checkpointed: every iteration's rank rebase left-joins `nodes`, and
    // without materialization the union+distinct over the edge endpoints
    // re-runs once PER ITERATION inside the final plan. In dangling mode the
    // node table CARRIES a has_out flag (folded in by the same left join the
    // endpoint distinct already pays), so each round's dangling-mass sum is
    // a filter + one-row aggregate over the rank state instead of a
    // semi-join against a separate checkpointed anti-join table — one
    // exchange fewer per iteration, one checkpoint fewer up front (guide
    // §2.4 remove shuffles outright; r17 measured the semi-join at 2-3 AQE
    // jobs × iters on the bench row).
    val endpoints = e.select(col("src").as("node"))
      .union(e.select(col("dst").as("node"))).distinct()
    val nodes =
      (if (!redistributeDangling) endpoints
       else {
         val srcNodes = e.select(col("src").as("node")).distinct()
           .withColumn("_o", lit(true))
         endpoints.join(srcNodes, Seq("node"), "left")
           .select(col("node"), coalesce(col("_o"), lit(false)).as("has_out"))
       }).localCheckpoint()
    val nNodes = if (redistributeDangling) nodes.count().toDouble else 0.0
    var ranks = nodes.withColumn("rank", lit(1.0))
    for (_ <- 1 to iters) {
      val contribs = e
        .join(ranks, e("src") === ranks("node"))
        .select(col("dst").as("node"), (col("rank") / col("outdeg")).as("c"))
        .groupBy("node").agg(sum("c").as("in_sum"))
      val base = nodes.join(contribs, Seq("node"), "left")
      ranks =
        if (!redistributeDangling)
          base.select(col("node"),
            round(lit(1.0 - damping) +
              lit(damping) * coalesce(col("in_sum"), lit(0.0)), 9).as("rank"))
        else {
          // one-row scalar aggregate, broadcast back — rank state must be
          // checkpointed per round here or the dangling-sum subplan would
          // re-derive the whole rank history each iteration
          val dSum = ranks.filter(!col("has_out"))
            .agg(coalesce(sum("rank"), lit(0.0)).as("d_sum"))
          base.crossJoin(broadcast(dSum))
            .select(col("node"), col("has_out"),
              round(lit(1.0 - damping) +
                lit(damping) * (coalesce(col("in_sum"), lit(0.0)) +
                  col("d_sum") / lit(nNodes)), 9).as("rank"))
            .localCheckpoint()
        }
    }
    if (redistributeDangling) ranks.select("node", "rank") else ranks
  }

  /** Both-direction undirected edge set: each undirected edge appears
    * exactly once per direction, self-loops dropped — ONE distinct shuffle
    * (symmetrize first, then dedup) instead of the canonicalize-then-mirror
    * two-shuffle version, checkpointed because every iteration of the
    * consumers re-reads it. (a,b)+(b,a) duplicates collapse because both
    * produce the same symmetric pair set.
    */
  private def symmetrized(edges: DataFrame): DataFrame =
    edges.filter(col("src") =!= col("dst"))
      .select(col("src"), col("dst"))
      .union(edges.filter(col("src") =!= col("dst"))
        .select(col("dst").as("src"), col("src").as("dst")))
      // dst-first partitioning: the distinct's (src, dst) clustering is
      // satisfied by hash(dst) (no second exchange — see pageRank), and the
      // checkpointed layout is the one labelPropagation's per-round
      // (dst, label) aggregate needs, so those rounds skip their exchange too
      .repartition(col("dst"))
      .distinct()
      .localCheckpoint()

  /** Canonical undirected edge set: (a, b) with a < b, self-loops dropped,
    * duplicates (including reversed duplicates) collapsed. The shared front
    * door of the undirected algorithms below.
    */
  def canonicalUndirected(edges: DataFrame): DataFrame =
    edges.select(
        least(col("src"), col("dst")).as("a"),
        greatest(col("src"), col("dst")).as("b"))
      .filter(col("a") =!= col("b"))
      .distinct()

  /** Per-node triangle participation counts — the local clustering signal a
    * link-graph curation pass uses to separate organic neighborhoods from
    * link farms (spam rings are triangle-dense; long-tail content is
    * triangle-sparse).
    *
    * Algorithm: DEGREE-ORDERED orientation (the node-iterator refinement of
    * Chiba–Nishizeki; "compact-forward" in Latapy, Theor. Comput. Sci. 2008):
    * each undirected edge orients from its lower-(degree, id) endpoint to the
    * higher; wedges form at the LOWEST-ordered corner over its out-neighbor
    * pairs; a triangle is a wedge whose closing edge exists in the same
    * orientation. Every out-degree is O(√m), so a hub of degree 10⁶ that
    * would put 10¹²/2 wedges in one id-ordered partition contributes almost
    * none here — its edges orient INTO it. Each triangle is still enumerated
    * exactly once (at its minimum-ordered corner), then credited to all
    * three corners — the same count set as the plain a<b<c enumeration, so
    * the oracle is unchanged.
    *
    * Scale shape: one degree aggregate plus equi-joins of the narrow (node,
    * degree) table into the edge set (broadcast while the node table fits,
    * shuffled-hash beyond), then two hash-joins of the oriented
    * edge table against itself — first keyed on the wedge corner, then on
    * the closing (x, y) pair; all exchanges carry only node-id/degree
    * columns. No cartesian anything.
    *
    * Output: (node, n_triangles), one row per node that closes ≥ 1 triangle.
    */
  def triangleCounts(edges: DataFrame): DataFrame = {
    // NOT checkpointed: the repeated reads below collapse via ReusedExchange
    // (the wedge sides are byte-identical subplans), and keeping the lineage
    // declarative lets the caller's filters stay visible as pushed scans —
    // PlanAuditSpec locks that property on the gated query.
    val e = canonicalUndirected(edges)
    // undirected degree over the deduped edge set; (deg, id) is the total order
    val deg = e.select(col("a").as("node")).union(e.select(col("b").as("node")))
      .groupBy("node").agg(count(lit(1)).as("deg"))
    val withDeg = e
      .join(deg.toDF("a", "dega"), "a")
      .join(deg.toDF("b", "degb"), "b")
    val aLower = struct(col("dega"), col("a")) < struct(col("degb"), col("b"))
    // (u, v, degv): order(u) < order(v) — out-degree bounded by O(√m)
    val o = withDeg.select(
        when(aLower, col("a")).otherwise(col("b")).as("u"),
        when(aLower, col("b")).otherwise(col("a")).as("v"),
        when(aLower, col("degb")).otherwise(col("dega")).as("degv"))
    val tri = o.toDF("u", "x", "degx")
      .join(o.toDF("u", "y", "degy"), "u")         // wedge at the lowest corner
      .filter(struct(col("degx"), col("x")) < struct(col("degy"), col("y")))
      .join(o.select(col("u").as("x"), col("v").as("y")), Seq("x", "y")) // closing edge x→y
      .select(col("u").as("a"), col("x").as("b"), col("y").as("c"))
    tri.select(explode(array(col("a"), col("b"), col("c"))).as("node"))
      .groupBy("node").agg(count(lit(1)).as("n_triangles"))
  }

  /** Minimum hop distance from a set of source nodes, bounded at `maxHops` —
    * provenance reachability ("everything within k links of a known-bad
    * domain") as synchronous frontier BFS.
    *
    * Treats edges as UNDIRECTED (both directions are traversed). Each round
    * is one join of the edge table against the current distance state keyed
    * on the endpoint plus a min-aggregate — the same narrow (node, int)
    * exchange shape as [[pageRank]]. The state is localCheckpoint-ed per
    * round: BFS state lineage otherwise doubles every round (state_i
    * references edges ⋈ state_{i-1} AND state_{i-1}), which is exponential
    * plan growth by round 10; checkpointing is what every Pregel loop does.
    * (A checkpoint-every-2-rounds cadence was measured at sf0.1 — min 4.58 s
    * vs 4.50 s per-round over multiple full-bench runs, a wash at 3 hops —
    * so the simpler per-round policy stays; see PLANS.md round-7 notes.)
    *
    * Output: (node, hops), only nodes reachable within `maxHops`.
    */
  def hopDistances(edges: DataFrame, sources: DataFrame, maxHops: Int): DataFrame = {
    require(maxHops >= 1, "need at least one hop")
    val e = symmetrized(edges)
    var dist = sources.select(col("node")).distinct()
      .withColumn("hops", lit(0)).localCheckpoint()
    for (_ <- 1 to maxHops) {
      val next = e.join(dist, e("src") === dist("node"))
        .select(col("dst").as("node"), (col("hops") + 1).as("hops"))
      dist = dist.union(next)
        .groupBy("node").agg(min("hops").as("hops"))
        .localCheckpoint()
    }
    dist
  }

  /** Synchronous label propagation (Raghavan et al., "Near linear time
    * algorithm to detect community structures in large-scale networks",
    * Phys. Rev. E 2007) — the community-detection complement to the
    * min-label connected components in [[Dedup]]: a node adopts its
    * neighbors' MOST FREQUENT label each round, so dense clusters converge
    * to one label while bridges stay thin.
    *
    * Determinism (the published algorithm is randomized; this is the
    * oracle-replicable variant): labels start as the node's own id,
    * updates are synchronous, and ties break to the SMALLEST label — both
    * engines order by (count desc, label asc) and take row 1.
    *
    * Node universe: by default the distinct endpoints of `edges`, so an
    * edge-less node never appears in the output. Pass `nodes` (a `node`
    * column; unioned with the endpoints, so it can't lose anyone) to include
    * isolated nodes — they keep their own id as label.
    *
    * Scale shape per round: one join of the (symmetrized) edge table
    * against the label state keyed on src, a (node, label) count aggregate
    * (map-side combined), and a per-node top-1 window keyed on node — three
    * narrow exchanges, no driver funnel. Label state is localCheckpoint-ed
    * per round for the same lineage reason as [[hopDistances]].
    *
    * Output: (node, label) after `iters` rounds.
    */
  def labelPropagation(edges: DataFrame, iters: Int = 3,
                       nodes: Option[DataFrame] = None): DataFrame = {
    require(iters >= 1, "need at least one iteration")
    val e = symmetrized(edges)
    val endpoints = e.select(col("src").as("node"))
    val nodeSet = nodes match {
      case Some(n) => n.select(col("node")).union(endpoints).distinct()
      case None    => endpoints.distinct()
    }
    var labels = nodeSet.withColumn("label", col("node")).localCheckpoint()
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy("node").orderBy(col("c").desc, col("label"))
    for (_ <- 1 to iters) {
      val top = e.join(labels, e("src") === labels("node"))
        .groupBy(col("dst").as("node"), col("label"))
        .agg(count(lit(1)).as("c"))
        .withColumn("rn", row_number().over(w))
        .filter(col("rn") === 1)
        .select("node", "label")
      labels = nodeSet.join(top, Seq("node"), "left")
        .select(col("node"), coalesce(col("label"), col("node")).as("label"))
        .localCheckpoint()
    }
    labels
  }
}
