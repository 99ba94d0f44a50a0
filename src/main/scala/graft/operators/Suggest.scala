package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Query-assist operators a search engine grows next to its index: spelling
  * suggestion, prefix autocomplete, best-window snippet highlighting, and
  * faceted result counts. The reference stops at raw search results
  * (full_text_search_index.py returns hits only); these are the standard
  * serving-side companions, built Spark-first: every one is a declarative
  * plan over the vocabulary/hit tables — codegen'd expressions, narrow-key
  * joins, no UDFs, no driver loops.
  */
object Suggest {

  // The SymSpell deletion neighborhood (github.com/wolfgarbe/SymSpell's
  // delete-only candidate model) is the codegen'd DeletionVariants kernel
  // since r16 (plans/SuffixSeedExpression.scala) — the declarative
  // nested-transform form ran interpreted with a substring concat per
  // variant, paid over the WHOLE vocabulary at every key build and over the
  // batch vocabulary at every incremental update. Parity (contents and
  // first-occurrence order) is pinned in SuffixSeedSpec.

  /** Spelling suggestions for each query term against a (term, df)
    * vocabulary, exact under Levenshtein distance ≤ `maxEdits`, ranked by
    * (distance asc, df desc, term asc), top `topK` per query.
    *
    * Scale shape — the reason this is SymSpell and not a cross join: both
    * sides explode into their deletion neighborhoods and meet in ONE
    * equi-join on the delete key (narrow string keys, broadcastable query
    * side), then only the candidate pairs pay the O(L²) `levenshtein`
    * verify. A |vocab| × |queries| cross join at 100 TB vocab scale is the
    * plan this avoids; the delete-key table is precomputable and reusable
    * across queries (it is a pure function of the vocabulary). Exactness:
    * lev(a,b) ≤ e ⟹ deleting the edited positions from each side meets in
    * a common variant, so the equi-join loses no true candidate; the
    * verify step discards the false ones.
    */
  def spellSuggest(vocab: DataFrame, termCol: String, dfCol: String,
                   queries: DataFrame, qCol: String,
                   maxEdits: Int = 2, topK: Int = 3): DataFrame =
    spellSuggestFromKeys(deletionKeys(vocab, termCol, maxEdits),
      vocab.select(col(termCol).as("term"), col(dfCol).as("df")),
      queries, qCol, maxEdits, topK)

  /** The vocabulary half of the SymSpell join as a standalone (term, delkey)
    * frame — the PRECOMPUTABLE artifact: it is a pure function of the term
    * set, so an engine persists it next to the index and pays the O(|vocab|
    * × L^maxEdits) explode once instead of per query
    * ([[graft.operators.Bm25Indexer.buildSuggestKeys]] is that seam).
    */
  def deletionKeys(vocab: DataFrame, termCol: String, maxEdits: Int): DataFrame =
    vocab.where(length(col(termCol)) > 0)
      .select(col(termCol).as("term")).distinct()
      .withColumn("delkey", explode(
        graft.plans.SuffixSeedFunctions.deletionVariants(col("term"), maxEdits)))

  /** [[spellSuggest]] against a prebuilt (term, delkey) frame. `termDf`
    * supplies df ranking AT QUERY TIME (inner join), so a stale key artifact
    * can never resurrect a deleted term or serve a stale frequency — keys
    * only nominate candidates; df and existence come from the live table.
    */
  def spellSuggestFromKeys(vocabKeys: DataFrame, termDf: DataFrame,
                           queries: DataFrame, qCol: String,
                           maxEdits: Int, topK: Int): DataFrame = {
    val vv = vocabKeys.select(col("term").as("_term"), col("delkey").as("_delkey"))
    val qv = queries.where(length(col(qCol)) > 0)
      .select(col(qCol).as("_q"))
      .withColumn("_delkey", explode(
        graft.plans.SuffixSeedFunctions.deletionVariants(col("_q"), maxEdits)))
    val candidates = qv.join(vv, Seq("_delkey"))
      .select(col("_q"), col("_term")).distinct()
      .where(levenshtein(col("_q"), col("_term")) <= maxEdits)
      .withColumn("dist", levenshtein(col("_q"), col("_term")))
      .join(termDf.select(col("term").as("_term"), col("df").as("_df")), Seq("_term"))
    val w = org.apache.spark.sql.expressions.Window.partitionBy(col("_q"))
      .orderBy(col("dist").asc, col("_df").desc, col("_term").asc)
    candidates.withColumn("rank", row_number().over(w))
      .where(col("rank") <= topK)
      .select(col("_q").as(qCol), col("_term").as("suggestion"),
        col("dist").cast("long").as("dist"), col("_df").as("term_df"),
        col("rank").cast("long").as("rank"))
  }

  /** Top-`k` completions of `prefix` from a (term, df) vocabulary, by
    * (df desc, term asc). One `startsWith` filter + one top-k: on a
    * term-sorted parquet vocabulary the prefix predicate prunes row groups
    * via min/max footer stats, so the scan is ~the matching range, not the
    * vocabulary.
    */
  def autocomplete(vocab: DataFrame, termCol: String, dfCol: String,
                   prefix: String, k: Int): DataFrame =
    vocab.where(col(termCol).startsWith(prefix))
      .orderBy(col(dfCol).desc, col(termCol).asc)
      .limit(k)
      .select(col(termCol).as("suggestion"), col(dfCol).as("term_df"))

  /** Best-window snippet per document: slide a `window`-word window over the
    * whitespace-tokenized text, count query-term hits per window
    * (case-insensitive), keep the EARLIEST window with the maximum count.
    * Returns (id, snippet, n_hits) for documents with ≥ 1 hit. All per-row
    * array expressions (transform/aggregate/slice) — embarrassingly
    * parallel, no shuffle, whole-stage codegen.
    */
  def highlightSnippet(docs: DataFrame, idCol: String, textCol: String,
                       queryTerms: Seq[String], window: Int,
                       stems: Seq[String] = Nil): DataFrame = {
    require(window >= 1, "window must be >= 1")
    // Terms enter the plan as literal Columns, never spliced into SQL text —
    // a term like "don't" (or anything adversarial from a user query) can't
    // break the expression parse or inject expressions. `stems` are prefix
    // stems (the MATCH grammar's `tok*` / phrase-prefix atoms). Snippets
    // SLICE the original whitespace words (what a UI shows), but hit-testing
    // runs each word through the ENGINE tokenizer: "hash-join" highlights
    // for the atom `hash` or the stem `jo*`, exactly as it matches on the
    // index and scan paths (the r15 single-tokenizer contract).
    // Query terms normalize through the SAME tokenizer (a raw "don't"
    // becomes the tokens don, t — exactly what the scan and index paths
    // would search for); a term with no indexable tokens simply never hits.
    // The whole window scan is ONE codegen'd kernel call
    // ([[graft.plans.BestHighlightWindow]]): hit-test each word once through
    // the engine tokenizer, slide the window with a running sum, O(words)
    // per row — the declarative higher-order form re-evaluated its lambdas
    // interpreted and re-spliced the per-word array per window.
    val qTokens = queryTerms.flatMap(Search.tokenize)
    val pTokens = stems.flatMap(Search.tokenize)
    docs
      .withColumn("_b", graft.plans.TokenizeFunctions.bestHighlightWindow(
        expr(s"filter(split($textCol, ' '), x -> x <> '')"),
        window, qTokens, pTokens))
      .where(col("_b").isNotNull)
      .select(col(idCol),
        col("_b.snippet").as("snippet"),
        col("_b.n_hits").as("n_hits"))
  }

  /** Faceted counts over a hit frame — the per-dimension value histogram a
    * search UI renders next to results. For EACH facet column: top-`topK`
    * values by (count desc, value asc). One groupBy per facet over the SAME
    * (typically small: top-N hits) input, unioned; each is a partial-agg
    * map-side shape.
    */
  def facetCounts(hits: DataFrame, facetCols: Seq[String], topK: Int = 10): DataFrame = {
    require(facetCols.nonEmpty, "need at least one facet column")
    val perFacet = facetCols.map { f =>
      val counted = hits.groupBy(col(f).cast("string").as("value"))
        .agg(count(lit(1)).as("n"))
      val w = org.apache.spark.sql.expressions.Window
        .orderBy(col("n").desc, col("value").asc)
      counted.withColumn("rank", row_number().over(w))
        .where(col("rank") <= topK)
        .select(lit(f).as("facet"), col("value"), col("n"),
          col("rank").cast("long").as("rank"))
    }
    perFacet.reduce(_.unionByName(_))
  }
}
