package graft.operators

import graft.functions.Embedder
import graft.plans.VectorFunctions._
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Search operators: exact vector top-k, BM25 top-k, RRF fusion, document grouping.
  *
  * Mirrors the reference's search lifecycle (/root/reference/main/core/
  * documents_collection_searcher.py): per-index retrieval (:31-65), Reciprocal Rank
  * Fusion (:46-65), and grouping ranked chunks into documents (:67-96) — re-expressed
  * as declarative DataFrame plans so Catalyst plans the physical execution
  * (TakeOrderedAndProject for every top-k, broadcast hash join for metadata lookups).
  */
object Search {

  /** Shared tokenizer: lowercase, split on non-alphanumeric runs, drop empties.
    * Chosen to be reproducible in ANSI SQL (oracle parity) — the reference's FTS5
    * unicode61 tokenizer is approximated, not bit-copied (SURVEY.md §7.3).
    * Served by the codegen'd [[graft.plans.EngineTokenize]] kernel (one byte
    * scan; bit-parity with `filter(split(lower(c), "[^a-z0-9]+"), _ != "")`
    * including the non-ASCII fallback — TextHashSpec pins it).
    */
  def tokensCol(c: Column): Column =
    graft.plans.TokenizeFunctions.engineTokenize(c)

  def tokenize(s: String): Seq[String] =
    if (s == null) Nil else s.toLowerCase.split("[^a-z0-9]+").filter(_.nonEmpty).toSeq

  /** Empty ranked list WITH the (id, score) schema — a bare emptyDataFrame has no
    * columns and would fail analysis inside RRF fusion when a query has no
    * indexable tokens (e.g. CJK/punctuation-only).
    */
  def emptyScored(spark: org.apache.spark.sql.SparkSession, idCol: String): DataFrame =
    spark.createDataFrame(
      spark.sparkContext.emptyRDD[org.apache.spark.sql.Row],
      org.apache.spark.sql.types.StructType(Seq(
        org.apache.spark.sql.types.StructField(idCol, org.apache.spark.sql.types.LongType),
        org.apache.spark.sql.types.StructField("score", org.apache.spark.sql.types.DoubleType))))

  /** Exact kNN over an embedding column — the semantics of FAISS IndexFlatL2
    * (faiss_indexer.py:30-31) as a full scan + TakeOrderedAndProject. The scan is
    * embarrassingly parallel; only k rows per partition reach the driver.
    * `metric`: "l2" (ascending) or "cosine" (descending).
    */
  def vectorTopK(
      chunks: DataFrame,
      embeddingCol: String,
      queryVec: Array[Float],
      k: Int,
      metric: String = "l2",
      preFilter: Option[Column] = None,
      idCol: String = "chunkId"): DataFrame = {
    val q = typedLit(queryVec)
    val filtered = preFilter.map(chunks.filter).getOrElse(chunks)
    val scored = metric match {
      case "l2"     => filtered.withColumn("score", l2SqF(col(embeddingCol), q))
      case "cosine" => filtered.withColumn("score", -cosineF(col(embeddingCol), q))
      case "dot"    => filtered.withColumn("score", -dotF(col(embeddingCol), q))
      case m        => throw new IllegalArgumentException(s"unknown metric $m")
    }
    // Ascending score = better; deterministic tie-break on id.
    scored.orderBy(col("score").asc, col(idCol).asc).limit(k)
  }

  /** Batch exact kNN: top-k corpus neighbors for EVERY query vector in one
    * pass — the shape for deduping/linking a batch of new embeddings against a
    * corpus. The (small) query batch broadcasts against the corpus scan; the
    * per-query top-k window shuffles only narrow (queryId, id, score) triples,
    * never the vectors. For large batches route per-query IVF probes instead
    * ([[Ann.searchIvf]]) — this is the exact baseline they're measured against.
    * Score convention matches [[vectorTopK]]: ascending = better.
    */
  def vectorTopKBatch(
      corpus: DataFrame, embeddingCol: String, idCol: String,
      queries: DataFrame, qIdCol: String, qVecCol: String,
      k: Int, metric: String = "l2"): DataFrame = {
    val scoreCol = metric match {
      case "l2"     => l2SqF(col(embeddingCol), col(qVecCol))
      case "cosine" => -cosineF(col(embeddingCol), col(qVecCol))
      case "dot"    => -dotF(col(embeddingCol), col(qVecCol))
      case m        => throw new IllegalArgumentException(s"unknown metric $m")
    }
    val scored = corpus.crossJoin(broadcast(queries))
      .select(col(qIdCol), col(idCol), scoreCol.as("score"))
    scored
      .withColumn("rank", row_number().over(
        org.apache.spark.sql.expressions.Window.partitionBy(qIdCol)
          .orderBy(col("score").asc, col(idCol).asc)).cast("long"))
      .filter(col("rank") <= k)
  }

  /** Late-interaction (ColBERT-style, Khattab & Zaharia, SIGIR 2020) maxsim
    * scoring: a document is a BAG of vectors (its chunks' embeddings); the
    * query is a small set of vectors (its token/phrase embeddings); score =
    * Σ over query vectors of (max over the doc's vectors of cosine). Captures
    * fine-grained term-level matching that single-vector pooling averages
    * away — the quality step between single-vector ANN and a cross-encoder.
    *
    * Scale shape: the query vectors are DRIVER-SIDE literals, so each per-query
    * max is a codegen'd map-side aggregate column — ONE hash aggregate keyed
    * on the doc id (partial max per partition, then one narrow exchange of
    * |docs| × |queryVecs| doubles), no join, no explode, vectors never
    * shuffle. The final top-k is a TakeOrderedAndProject. For query batches
    * too large to inline, route through [[vectorTopKBatch]] + a grouped max
    * instead.
    *
    * Per-query maxima are rounded to 6dp BEFORE the fixed-order sum so the
    * oracle (which sums the same rounded maxima in the same literal order)
    * reproduces the score bit for bit.
    */
  def maxSimTopK(vectors: DataFrame, docCol: String, vecCol: String,
                 queryVecs: Seq[Array[Float]], k: Int): DataFrame = {
    require(queryVecs.nonEmpty, "need at least one query vector")
    val maxima = queryVecs.zipWithIndex.map { case (qv, i) =>
      round(max(cosineF(col(vecCol), typedLit(qv))), 6).as(s"_q$i")
    }
    vectors.groupBy(col(docCol))
      .agg(maxima.head, maxima.tail: _*)
      .withColumn("maxsim",
        round(queryVecs.indices.map(i => col(s"_q$i")).reduce(_ + _), 6))
      .select(col(docCol), col("maxsim"))
      .orderBy(col("maxsim").desc, col(docCol).asc)
      .limit(k)
  }

  /** BM25 top-k with the reference's conjunctive semantics (every query term must
    * appear: sqllite_indexer.py:145-150). Robertson k1=1.2 b=0.75; idf =
    * ln(1 + (N - df + 0.5)/(df + 0.5)) — standard Lucene/FTS5-style formulation.
    *
    * Plan shape: one scan of the corpus → explode to (doc, term) filtered to the
    * query's terms (tiny, broadcastable) → two hash aggregations. Term stats join is
    * a broadcast; no shuffle touches the full corpus width.
    */
  def bm25TopK(
      docs: DataFrame,
      idCol: String,
      textCol: String,
      query: String,
      k: Int,
      k1: Double = 1.2,
      b: Double = 0.75,
      preFilter: Option[Column] = None,
      conjunctive: Boolean = true,
      selectByRounded: Option[Int] = None): DataFrame = {
    val queryTerms = tokenize(query).distinct
    if (queryTerms.isEmpty) return emptyScored(docs.sparkSession, "docId")
    val termList = queryTerms.map(t => s"'${t.replace("'", "''")}'").mkString(", ")

    val corpus = preFilter.map(docs.filter).getOrElse(docs)
      .select(col(idCol).as("docId"), tokensCol(col(textCol)).as("tokens"))

    // Corpus stats stay a (1-row, broadcast) plan node — no separate driver action.
    val stats = corpus.agg(count("*").as("n"), avg(size(col("tokens"))).as("avgdl"))

    // Keep only query-term tokens BEFORE exploding: the exploded row count is
    // docs × matched-terms, not docs × doc-length. df (document frequency) comes
    // from a window over the already-tiny docTerm set — no recompute branch.
    val docTerm = corpus
      .select(col("docId"), size(col("tokens")).as("docLen"),
        explode(expr(s"filter(tokens, t -> t IN ($termList))")).as("term"))
      .groupBy("docId", "docLen", "term").agg(count("*").as("tf"))
      .withColumn("df", count("*").over(Window.partitionBy("term")))

    val idf = log(lit(1.0) + (col("n") - col("df") + lit(0.5)) / (col("df") + lit(0.5)))
    val tfNorm = (col("tf") * (lit(k1) + 1.0)) /
      (col("tf") + lit(k1) * (lit(1.0) - lit(b) + lit(b) * col("docLen") / col("avgdl")))

    val scored = docTerm.crossJoin(broadcast(stats))
      .withColumn("termScore", idf * tfNorm)
      .groupBy("docId")
      .agg(sum("termScore").as("score"), countDistinct("term").as("matched"))

    val gated = if (conjunctive) scored.filter(col("matched") === queryTerms.length) else scored
    // Boundary selection: when `selectByRounded` is set, the k-cut orders by the
    // ROUNDED score (ties broken by id). Raw-double cuts are unstable across
    // engines — ln() differs in the last ulp between libms — so oracle-checked
    // callers cut exactly like the oracle's round(score, n) ordering.
    val ord = selectByRounded match {
      case Some(n) => Seq(round(col("score"), n).desc, col("docId").asc)
      case None    => Seq(col("score").desc, col("docId").asc)
    }
    gated.select(col("docId"), col("score")).orderBy(ord: _*).limit(k)
  }

  /** Reciprocal Rank Fusion (searcher.py:46-65, constant k=60): each input is an
    * already-ordered top-k list (tiny); rank = position, fused score =
    * Σ 1/(k + rank). Union of k-row lists then one hash agg — negligible shuffle.
    */
  def rrfFuse(
      rankedLists: Seq[DataFrame],
      idCol: String,
      orderCol: String,
      ascending: Seq[Boolean],
      rrfK: Int = 60,
      topK: Int = Int.MaxValue,
      weights: Seq[Double] = Nil): DataFrame = {
    require(rankedLists.nonEmpty && rankedLists.size == ascending.size)
    require(weights.isEmpty || weights.size == rankedLists.size,
      "weights must be empty (uniform) or one per ranked list")
    // weighted RRF: score = Σ_i w_i / (k + rank_i) — the standard tuning knob
    // when one index (say BM25 on titles) should count more than another;
    // uniform weights reduce to the reference's plain RRF exactly
    val ws = if (weights.isEmpty) Seq.fill(rankedLists.size)(1.0) else weights
    val ranked = rankedLists.zip(ascending).zip(ws).map { case ((l, asc), w0) =>
      val ord = if (asc) col(orderCol).asc else col(orderCol).desc
      val w = Window.orderBy(ord, col(idCol).asc)
      l.select(col(idCol), row_number().over(w).as("rank"), lit(w0).as("_w"))
    }
    val fused = ranked.reduce(_.unionByName(_))
      .groupBy(idCol)
      .agg(sum(col("_w") / (lit(rrfK) + col("rank"))).as("rrfScore"),
           min("rank").as("bestRank"))
      .orderBy(col("rrfScore").desc, col(idCol).asc)
    if (topK == Int.MaxValue) fused else fused.limit(topK)
  }

  /** Result projection flags (P7 — searcher.py:18-44,86-91,98-111): which payload
    * columns appear in search results. `documents` supplies the doc table for
    * text/all-chunks payloads (J2 — the chunk↔document lookup join).
    */
  final case class Projection(
      includeText: Boolean = false,
      includeMatchedChunkContent: Boolean = false,
      includeAllChunksContent: Boolean = false,
      documents: Option[DataFrame] = None)

  /** Group ranked chunks into documents: document order = best (min) chunk rank,
    * chunk list per document kept in rank order (searcher.py:67-96 / SURVEY A2).
    * Ties broken by id so output order is deterministic (SURVEY §7.3.6).
    */
  def groupIntoDocuments(
      rankedChunks: DataFrame, // columns: chunkId, rank + chunk payload
      chunksMeta: DataFrame,   // columns: chunkId, documentId, ...
      maxDocs: Int,
      projection: Projection = Projection()): DataFrame = {
    val chunkStruct =
      if (projection.includeMatchedChunkContent)
        struct(col("rank"), col("chunkId"), col("chunkNumber"), col("indexedData"))
      else struct(col("rank"), col("chunkId"))
    val grouped = broadcast(rankedChunks) // the k-row RESULT side broadcasts, never the chunks table
      .join(chunksMeta, "chunkId")
      .groupBy("documentId")
      .agg(
        first("documentUrl").as("documentUrl"),
        min("rank").as("docRank"),
        count("*").as("matchedChunkCount"),
        sort_array(collect_list(chunkStruct)).as("matchedChunks"))
      .orderBy(col("docRank").asc, col("documentId").asc)
      .limit(maxDocs)

    // J2: per result doc, pull payloads from the documents table — k-row
    // broadcast-side join against the (big) documents table.
    projection.documents match {
      case Some(docs) if projection.includeText || projection.includeAllChunksContent =>
        val docCols =
          Seq(col("documentId")) ++
          (if (projection.includeText) Seq(col("text").as("textContent")) else Nil) ++
          (if (projection.includeAllChunksContent)
            Seq(col("chunks").getField("indexedData").as("allChunksContent")) else Nil)
        grouped.join(
          docs.select(col("id").as("documentId") +: docCols.tail: _*),
          Seq("documentId"), "left")
          .orderBy(col("docRank").asc, col("documentId").asc)
      case _ => grouped
    }
  }

  /** End-to-end hybrid search over a chunks index table: vector + BM25 → RRF →
    * documents. The flagship lifecycle (SURVEY §3.1).
    */
  def hybridSearch(
      chunks: DataFrame,
      embedder: Embedder,
      query: String,
      maxChunks: Int = 15,
      maxDocs: Int = 5,
      metadataFilter: Option[String] = None,
      projection: Projection = Projection()): DataFrame = {
    val pre = metadataFilter.map(f =>
      graft.functions.FilterDsl.metadataFilterColumn(f, col("metadata")))
    val vec = vectorTopK(chunks, "embedding", embedder.embed(query), maxChunks, "l2", pre)
      .select(col("chunkId"), col("score"))
    val bm = bm25TopK(chunks, "chunkId", "indexedData", query, maxChunks, preFilter = pre)
      .withColumnRenamed("docId", "chunkId")
    val fused = rrfFuse(Seq(vec, bm), "chunkId", "score", Seq(true, false), 60, maxChunks)
      .withColumn("rank", row_number().over(
        Window.orderBy(col("rrfScore").desc, col("chunkId").asc)))
    groupIntoDocuments(
      fused.select("chunkId", "rank"),
      chunks.select("chunkId", "documentId", "documentUrl", "chunkNumber", "indexedData"),
      maxDocs, projection)
  }
}
