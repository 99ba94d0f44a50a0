package graft

import graft.api.Queries
import org.scalatest.funsuite.AnyFunSuite

/** Physical-plan regression checks: the properties that make these operators scale
  * (pushdown, broadcast, top-k pushdown, no accidental cartesian products) are
  * asserted on the executed plan so a refactor can't silently lose them.
  */
class PlanAuditSpec extends AnyFunSuite with SparkSuite {

  private val sf = "/root/testdata/sf0.001"

  private def plan(name: String): String = {
    val df = Queries.all(name).run(spark, sf)
    df.collect() // finalize the adaptive plan before inspecting it
    df.queryExecution.executedPlan.toString
  }

  test("q3 star join broadcasts every dimension (no sort-merge at this scale)") {
    val p = plan("q3_join_agg")
    assert(p.contains("BroadcastHashJoin"))
    assert(!p.contains("CartesianProduct"))
  }

  test("filter DSL compiles to predicates that push into the parquet scan") {
    val p = plan("p3_filter_dsl")
    assert(p.contains("PushedFilters:"))
    assert(p.contains("EqualTo(lang,en)"))
    assert(p.contains("GreaterThan(n_chars,200)"))
  }

  test("filtered boolean MATCH pushes the DSL predicates into the chunks scan") {
    val p = plan("ql_boolean_filtered")
    // the metadata gate reads the chunks table ONCE with the compiled filter
    // pushed into parquet, and applies as a semi-join — never per operand
    assert(p.contains("PushedFilters:"))
    assert(p.contains("EqualTo(lang,en)"))
    assert(p.contains("GreaterThan(n_chars,200)"))
    assert(p.contains("LeftSemi"))
  }

  test("anchored/phrase-prefix MATCH: every positional read is term-pruned (equality or range)") {
    // ^key and ^"the fast" read positions by EqualTo(term,…); the ^ta*
    // anchor reads by StringStartsWith — all row-group-pruning predicates
    // on the term-sorted segments; no leaf scans the vocabulary
    val p = plan("ql_anchor_index")
    assert(p.contains("PushedFilters:"))
    assert(p.contains("EqualTo(term,key)"), p.linesIterator.filter(_.contains("PushedFilters")).mkString("\n"))
    assert(p.contains("StringStartsWith(term,ta)"))
    val pp = plan("ql_phrase_prefix_index")
    assert(pp.contains("StringStartsWith(term,jo)"))
    assert(pp.contains("StringStartsWith(term,vec)"))
    assert(pp.contains("EqualTo(term,hash)") || pp.contains("In(term, [hash"))
  }

  test("vector top-k runs as TakeOrderedAndProject with pushed id filter") {
    val p = plan("t1_vector_topk")
    assert(p.contains("TakeOrderedAndProject"))
    assert(p.contains("Not(EqualTo(vec_id,0))"))
  }

  test("bm25 has no unbounded cartesian product (stats join is broadcast)") {
    val p = plan("t2_bm25_topk")
    assert(!p.contains("CartesianProduct"))
    assert(p.contains("TakeOrderedAndProject"))
  }

  test("incremental update anti-join is broadcast; unused chunk-id window pruned") {
    val p = plan("j3_incremental_update")
    assert(p.contains("BroadcastHashJoin") && p.contains("LeftAnti"))
    assert(!p.contains("Window")) // chunk_id unused => window must be pruned away
  }

  test("semi/anti flags resolve to one aggregate over one broadcast join") {
    val p = plan("j4_semi_anti")
    assert(!p.contains("CartesianProduct"))
    assert(p.contains("BroadcastHashJoin"))
  }

  test("q5 six-table join: dims broadcast, date range pushed to the orders scan") {
    val p = plan("q5_region")
    assert(p.contains("BroadcastHashJoin"))
    assert(!p.contains("CartesianProduct"))
    assert(p.contains("PushedFilters:") && p.contains("GreaterThanOrEqual(o_orderdate"))
  }

  test("postings BM25 search prunes by term and never tokenizes the corpus") {
    val p = plan("t2b_bm25_postings")
    // The query terms reach the postings parquet scan as pushed filters...
    assert(p.contains("PushedFilters:") && p.contains("In(term"))
    // ...and no Generate (explode-of-tokens) node exists at search time: the
    // full-corpus tokenize happened once at index build, not per query.
    assert(!p.contains("Generate"))
    assert(!p.contains("CartesianProduct"))
  }

  test("chunk fanout: no chunk text through the single-partition id window") {
    val p = plan("m5_chunk_fanout")
    assert(!p.contains("row_number")) // global row_number over chunk rows is gone
    val windowLines = p.linesIterator.filter(_.contains("Window ")).toSeq
    assert(windowLines.nonEmpty)
    // The running count consumes only (doc_id, n); text must not ride along.
    assert(windowLines.forall(l => !l.contains("text")))
  }

  test("no registered query plans a cartesian product (bounded-verify excepted)") {
    // dedup_ngram_jaccard is BY CONTRACT a bounded cross join (the exact-verify
    // path callers feed an LSH bucket or a capped subset); everything else must
    // never plan one. This is the blanket regression net under the targeted
    // audits above. The same pass reports every query whose plan funnels
    // corpus-scale data through an Exchange SinglePartition — the accidental
    // global-window shape that dies at cluster scale.
    val allowed = Set("dedup_ngram_jaccard")
    // Every name here funnels a BOUNDED frame, audited by hand:
    //   - mid-plan GlobalLimit over already-cut top-k search results (k ≤ 100
    //     rows): a1_rrf_fusion, a1b_weighted_rrf, a2_group_docs, t2_bm25_topk
    //   - one-row / few-row scalar aggregates (global SUM/MAX/AVG or a scalar
    //     subquery's threshold): a4_watermark_max, q6_forecast, q11, q14,
    //     q15, q19, q22, events_funnel, text_js_divergence, decontam_report
    //     (the one-row corpus contamination summary — partial aggregates
    //     map-side, one row per task crosses), t2c_bm25_lsm_search (the
    //     corpus-stats fold: 1 base row ⊕ 1 signed row per uncompacted
    //     update segment sum into (n, avgdl) — bounded by the compaction
    //     budget, never corpus data)
    //   - metadata-sized control frames the surrounding plan broadcasts back:
    //     m5_chunk_fanout's (doc_id, n) id window (m1_embed_pipeline and
    //     ql_match_docs reuse the same fan-out, so the same narrow window —
    //     chunk text and embeddings never cross it), the #buckets-row pack
    //     offset windows (sample_pack_sequences/shards), pca's fixed
    //     covariance buffer, the capped vocab/top-N tables of
    //     text_collocations / text_keywords.
    // A NEW name appearing below means corpus-scale data may be crossing one
    // task — justify it here or fix the plan.
    val singlePartitionAllowed = Set(
      "decontam_report",
      "a1_rrf_fusion", "a1b_weighted_rrf", "a2_group_docs", "a4_watermark_max",
      "events_funnel", "m1_embed_pipeline", "m5_chunk_fanout", "pca_top_component",
      "q11_important_stock", "q14_promo", "q15_top_supplier", "q19_disjunctive",
      "q22_no_orders", "q6_forecast", "ql_match_docs", "sample_pack_sequences",
      "sample_pack_shards", "t2_bm25_topk", "t2c_bm25_lsm_search",
      "text_collocations", "text_js_divergence", "text_keywords")
    // Non-equi joins plan BroadcastNestedLoopJoin; that's only safe when the
    // broadcast side is provably bounded. Every name here broadcasts a
    // BOUNDED build side, audited by hand:
    //   - one-row scalar-threshold cross joins (global avg/total/fraction):
    //     q11, q15, q22, events_funnel, text_js_divergence,
    //     sketch_quantile_hist, pca_top_component
    //   - one-row corpus-stats / bounded query-table cross joins (BM25 N+avgdl,
    //     the ≤25-row query-vector batches, the labeled eval query set, search
    //     query stats): t2_bm25_topk, t2b_bm25_postings, t2c_bm25_lsm_search
    //     (same one-row corpus-stats cross join as t2b, served from the LSM
    //     view), ql_boolean_index + ql_boolean_phrase_index +
    //     ql_boolean_near_index + ql_boolean_filtered + ql_phrase_prefix_index
    //     + ql_double_negation (booleanSearch's BM25 ranking stage — the
    //     identical one-row corpus-stats cross join), t1b_vector_batch,
    //     ann_recall_eval, eval_mrr, a1_rrf_fusion, a1b_weighted_rrf,
    //     a2_group_docs, text_collocations, text_keywords
    // A NEW name below means a non-equi join may be broadcasting an unbounded
    // side — justify it here or fix the plan.
    val bnljAllowed = Set(
      "a1_rrf_fusion", "a1b_weighted_rrf", "a2_group_docs", "ann_recall_eval",
      "eval_mrr", "events_funnel", "pca_top_component", "q11_important_stock",
      "q15_top_supplier", "q22_no_orders", "ql_boolean_index",
      "ql_boolean_phrase_index", "ql_boolean_near_index", "ql_boolean_filtered",
      "ql_anchor_index", "ql_double_negation", "ql_match_docs", "ql_prefix_index",
      "ql_phrase_prefix_index", "sketch_quantile_hist",
      "t1b_vector_batch", "t2_bm25_topk", "t2b_bm25_postings",
      "t2c_bm25_lsm_search", "text_collocations", "text_js_divergence",
      "text_keywords")
    val singlePartition = scala.collection.mutable.SortedSet.empty[String]
    val bnlj = scala.collection.mutable.SortedSet.empty[String]
    Queries.all.keys.toSeq.sorted.filterNot(allowed).foreach { name =>
      val p = plan(name)
      assert(!p.contains("CartesianProduct"), s"cartesian product in $name")
      if (p.contains("Exchange SinglePartition")) singlePartition += name
      if (p.contains("BroadcastNestedLoopJoin")) bnlj += name
    }
    val unexpected = singlePartition.diff(singlePartitionAllowed)
    assert(unexpected.isEmpty,
      s"unaudited Exchange SinglePartition in: ${unexpected.mkString(", ")}")
    val unexpectedBnlj = bnlj.diff(bnljAllowed)
    assert(unexpectedBnlj.isEmpty,
      s"unaudited BroadcastNestedLoopJoin in: ${unexpectedBnlj.mkString(", ")}")
  }

  test("set ops run as one full-outer join of the two distinct sets") {
    val p = plan("u2_set_ops").split("== Initial Plan ==")(0) // AQE repeats the tree
    assert(p.contains("FullOuter"))
    val joins = p.linesIterator.count(l =>
      l.contains("SortMergeJoin") || l.contains("ShuffledHashJoin") ||
        l.contains("BroadcastHashJoin"))
    assert(joins === 1, s"expected exactly one join, plan:\n$p")
  }

  test("decontamination joins the benchmark ngram set as a broadcast") {
    val p = plan("pipeline_decontaminate")
    // corpus ngrams never shuffle into the benchmark join — it must broadcast
    assert(p.contains("BroadcastHashJoin"))
    assert(!p.contains("CartesianProduct"))
  }

  test("stratified sampling is a pure scan filter — only the output sort exchanges") {
    val p = plan("sample_stratified")
    // the operator itself must not shuffle: the only exchange allowed is the
    // rangepartitioning of the query's final deterministic orderBy
    val exchanges = p.linesIterator.filter(_.contains("Exchange")).toSeq
    assert(exchanges.forall(_.contains("rangepartitioning")),
      s"sampling must not hash-shuffle, plan:\n$p")
  }

  test("shard packing: bucket offsets broadcast; no corpus-wide global window") {
    val p = plan("sample_pack_shards")
    assert(p.contains("BroadcastHashJoin"))
    // the only unpartitioned window runs over the #buckets-row offset table,
    // upstream of the broadcast exchange — the corpus-side window is keyed
    val corpusSide = p.split("BroadcastExchange")(0)
    assert(!corpusSide.contains("Window [") ||
      corpusSide.linesIterator.filter(_.contains("Window"))
        .forall(_.contains("windowspecdefinition(source")),
      s"corpus-side window must partition by bucket, plan:\n$p")
  }

  test("graph-ANN merge shuffles only narrow triples, keyed by query") {
    val p = plan("ann_graph_topk")
    // after the per-partition shard search, the only hash exchange is the
    // per-query merge — vectors never cross it
    val hashEx = p.linesIterator.filter(l =>
      l.contains("Exchange hashpartitioning")).toSeq
    assert(hashEx.nonEmpty && hashEx.forall(_.contains("query_id")),
      s"expected only the query_id merge exchange, plan:\n$p")
    assert(!hashEx.exists(_.contains("embedding")),
      "vectors must not cross the merge exchange")
  }

  test("cluster assignment aggregates partially before its one exchange") {
    val p = plan("cluster_assign")
    assert(!p.contains("CartesianProduct"))
    assert(p.contains("partial_count") || p.contains("HashAggregate"))
  }

  test("LM perplexity: vocab and marginal tables broadcast into the scoring") {
    val p = plan("text_lm_perplexity")
    // the OOV mapping (×2) and the left-marginal denominator must all be
    // broadcast joins — document text never shuffles for the model side
    assert(p.linesIterator.count(_.contains("BroadcastHashJoin")) >= 3,
      s"expected vocab+marginal broadcasts, plan:\n$p")
    // the model's counts and the scorer share the per-(doc,pair) aggregate:
    // the tokenize+unk-map pipeline must run once, not once per branch
    assert(p.contains("ReusedExchange"),
      s"expected the shared docPair exchange to be reused, plan:\n$p")
    assert(!p.contains("CartesianProduct"))
  }

  test("zorder key is a pure projection — only the output sort exchanges") {
    val p = plan("zorder_key")
    assert(!p.contains("Join"), s"morton key must not join, plan:\n$p")
    val exchanges = p.linesIterator.filter(_.contains("Exchange")).toSeq
    assert(exchanges.forall(_.contains("rangepartitioning")),
      s"only the deterministic output sort may exchange, plan:\n$p")
  }

  test("weighted sampling exchanges only for its stratum window and output sort") {
    val p = plan("sample_weighted")
    // one hash exchange keyed by the stratum (the ranking window), nothing
    // keyed by document text or id
    val hashEx = p.linesIterator.filter(_.contains("Exchange hashpartitioning")).toSeq
    assert(hashEx.forall(_.contains("lang")),
      s"only the per-stratum window may hash-exchange, plan:\n$p")
  }

  test("repeated spans: exchanges key on the span hash, never on text") {
    val p = plan("dedup_spans")
    val hashEx = p.linesIterator.filter(_.contains("Exchange hashpartitioning")).toSeq
    assert(hashEx.nonEmpty)
    assert(!hashEx.exists(_.contains("text")),
      s"document text must not cross an exchange, plan:\n$p")
  }

  test("bloom decontamination: probe is a map-side filter, no pre-agg join") {
    val p = plan("bloom_decontaminate")
    // the bitset probe must run as a Filter over the exploded ngrams — the
    // corpus never joins a benchmark table in this variant
    assert(p.contains("Filter UDF"), s"bloom probe must be a scan-side filter:\n$p")
    val joins = p.linesIterator.filter(_.contains("Join")).toSeq
    assert(joins.nonEmpty && joins.forall(_.contains("BroadcastHashJoin")),
      s"only the final per-doc broadcast join may appear, plan:\n$p")
  }

  test("KMV sketch partial-aggregates bounded buffers before its one exchange") {
    val p = plan("sketch_distinct_kmv")
    // plan text reads top-down: the exchange sits above the partial aggregate,
    // which sits above the generate — so partial buffers (k longs each), not
    // raw hash rows, are what cross the wire
    val iExch = p.indexOf("Exchange hashpartitioning(lang")
    val iPartial = p.indexOf("partial_kmvaggregator")
    val iGen = p.indexOf("Generate explode")
    assert(iExch >= 0 && iPartial > iExch && iGen > iPartial,
      s"expected Exchange > partial_kmv > explode order, plan:\n$p")
  }

  test("q6: every predicate pushes into the lineitem scan; no join") {
    val p = plan("q6_forecast")
    // PushedFilters is string-truncated in plan text; the scan prefix plus the
    // full Filter expression together witness all three predicate families.
    assert(p.contains("PushedFilters: [IsNotNull(l_shipdate)"))
    assert(p.contains(">= 0.05)") && p.contains("<= 0.07)") && p.contains("< 24.0)"))
    // scan reads only the 4 referenced columns, not the 11-column table
    assert(p.contains("ReadSchema: struct<l_quantity:double,l_extendedprice:double," +
      "l_discount:double,l_shipdate:timestamp_ntz>"))
    assert(!p.contains("Join"), s"q6 is a pure scan+agg, plan:\n$p")
  }

  test("q19: disjunctive brackets stay a hash join residual, not a nested loop") {
    val p = plan("q19_disjunctive")
    assert(p.contains("BroadcastHashJoin"), s"equi part must hash, plan:\n$p")
    assert(!p.contains("BroadcastNestedLoopJoin") && !p.contains("CartesianProduct"),
      s"the OR-of-ANDs must not degrade the join, plan:\n$p")
  }

  test("q21: all three fact self-joins key their exchanges on the orderkey") {
    val p = plan("q21_waiting")
    // the EXISTS/NOT-EXISTS decorrelation must stay semi/anti hash joins with
    // the suppkey inequality as a residual — never a nested loop
    assert(p.contains("LeftSemi") && p.contains("LeftAnti"))
    assert(!p.contains("BroadcastNestedLoopJoin") && !p.contains("CartesianProduct"))
    // every fact-side hash exchange keys on an orderkey alias, so the three
    // self-referencing sides co-partition and AQE can chain the stages
    val factEx = p.linesIterator.filter(l =>
      l.contains("Exchange hashpartitioning(l_orderkey") ||
      l.contains("Exchange hashpartitioning(ok")).toSeq
    val otherEx = p.linesIterator.filter(l =>
      l.contains("Exchange hashpartitioning") &&
      !l.contains("l_orderkey") && !l.contains("(ok") &&
      !l.contains("s_suppkey") && !l.contains("l_suppkey") &&
      !l.contains("s_name")).toSeq // the final (s_name, n_name) aggregation
    assert(otherEx.isEmpty,
      s"unexpected non-orderkey/supplier exchange:\n${otherEx.mkString("\n")}")
  }

  test("semantic dedup: cluster-keyed pair join, never a cartesian product") {
    val p = plan("dedup_semantic")
    assert(!p.contains("CartesianProduct") && !p.contains("BroadcastNestedLoopJoin"),
      s"pair generation must stay cluster-local, plan:\n$p")
  }

  test("PQ rerank: the full-precision pass is a pushed-down point lookup") {
    val p = plan("ann_pq_rerank")
    // the shortlist comes back as an IN-list predicate on the vector scan —
    // the re-rank touches only the shortlist's row groups, not the corpus
    assert(p.contains("PushedFilters:") && p.contains("In(vec_id"),
      s"shortlist ids must push into the scan, plan:\n$p")
    assert(p.contains("TakeOrderedAndProject"))
  }

  test("pagerank: every exchange keys on graph columns, never wide rows") {
    val p = plan("graph_pagerank")
    val hashEx = p.linesIterator.filter(_.contains("Exchange hashpartitioning")).toSeq
    assert(hashEx.nonEmpty)
    assert(hashEx.forall(l => l.contains("src") || l.contains("dst") || l.contains("node")),
      s"iteration exchanges must key on src/dst/node, plan:\n${hashEx.mkString("\n")}")
    assert(!p.contains("CartesianProduct") && !p.contains("BroadcastNestedLoopJoin"))
  }

  test("epoch shuffle: one hash exchange (the per-shard window), then the sort") {
    val p = plan("sample_epoch_shuffle")
    val hashEx = p.linesIterator.filter(_.contains("Exchange hashpartitioning")).toSeq
    assert(hashEx.nonEmpty && hashEx.forall(_.contains("shard_id")),
      s"only the per-shard position window may hash-exchange, plan:\n$p")
  }

  test("collocations: vocab joins broadcast — pair counts never sort-merge") {
    val p = plan("text_collocations")
    assert(p.linesIterator.count(_.contains("BroadcastHashJoin")) >= 2,
      s"unigram tables must broadcast into the PMI join, plan:\n$p")
    assert(!p.contains("SortMergeJoin"), s"no corpus-sized merge join, plan:\n$p")
  }

  test("triangles: month predicate pushes to the orders scan; no cartesian") {
    val p = plan("graph_triangles")
    assert(p.contains("PushedFilters:") && p.contains("o_orderdate"),
      s"the one-month window must reach the orders scan, plan:\n$p")
    assert(!p.contains("CartesianProduct") && !p.contains("BroadcastNestedLoopJoin"),
      s"triangle enumeration must stay a hash-join chain, plan:\n$p")
  }

  test("bfs and label prop: visible exchanges carry only graph columns") {
    // per-round plans are checkpoint-truncated (that's the point of the
    // lineage cut), so the visible plan shows only the post-loop stage:
    // bfs's hop histogram may hash-exchange on hops; communities is a
    // checkpoint scan + output sort and must show NO hash exchange at all
    val pBfs = plan("graph_bfs")
    val bfsEx = pBfs.linesIterator.filter(_.contains("Exchange hashpartitioning")).toSeq
    assert(bfsEx.forall(_.contains("hops")),
      s"post-BFS exchanges may key only on hops, plan:\n${bfsEx.mkString("\n")}")
    assert(!pBfs.contains("CartesianProduct"))
    val pComm = plan("graph_communities")
    assert(!pComm.linesIterator.exists(_.contains("Exchange hashpartitioning")),
      s"label state is checkpointed — only the output sort may exchange, plan:\n$pComm")
    assert(!pComm.contains("CartesianProduct"))
  }

  test("lr training: each iteration is one map-side-combined scalar aggregate") {
    val p = plan("quality_lr_train")
    // the FINAL collected output is the tiny param table; the training
    // aggregates themselves ran during query construction. What must hold in
    // the visible plan: no shuffle of the documents table beyond the scalar
    // aggregate's single-row exchange, and the scan reads only what the
    // features need.
    assert(!p.contains("CartesianProduct"))
  }

  test("readability: pure per-row map — no exchange except the output sort") {
    val p = plan("text_readability")
    val hashEx = p.linesIterator.filter(_.contains("Exchange hashpartitioning")).toSeq
    assert(hashEx.isEmpty,
      s"readability must not hash-exchange anything, plan:\n${hashEx.mkString("\n")}")
    assert(p.contains("ReadSchema") && p.contains("doc_id") && p.contains("text"),
      "scan must prune to (doc_id, text)")
  }

  test("funnel: step scans push their type filter; joins key on user_id") {
    val p = plan("events_funnel")
    assert(p.contains("PushedFilters:") && p.contains("event_type"),
      s"step filters must reach the events scan, plan:\n$p")
    assert(!p.contains("CartesianProduct"))
    val hashEx = p.linesIterator.filter(_.contains("Exchange hashpartitioning")).toSeq
    assert(hashEx.forall(_.contains("user_id")),
      s"funnel exchanges must key on user_id, plan:\n${hashEx.mkString("\n")}")
  }

  test("keywords: per-doc ranking window keys on the doc id") {
    val p = plan("text_keywords")
    // (the 1-row n_docs table legitimately cross-joins as a broadcast
    // nested loop — it multiplies nothing)
    val windows = p.linesIterator.filter(_.contains("windowspecdefinition")).toSeq
    assert(windows.nonEmpty && windows.forall(_.contains("doc_id")),
      s"top-k window must partition by doc, plan:\n$p")
  }
}
