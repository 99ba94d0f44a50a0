package graft.api

import graft.functions.{FilterDsl, HashingEmbedder}
import graft.operators.Search
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Driver-facing query registry: every operator from SURVEY.md §2 (plus the
  * training-data-pipeline extensions) is exercised by a named query with a DuckDB
  * oracle. Design rules for oracle hash-parity:
  *   - every output is explicitly ordered with a total deterministic order;
  *   - doubles are rounded AND ordered by their rounded value with an id tie-break,
  *     so a last-ulp divergence between engines cannot reorder rows;
  *   - counts/ranks are cast to BIGINT on the Spark side (DuckDB windows/counts are
  *     BIGINT);
  *   - string hashing common to both engines uses md5 hex (identical in both).
  */
object Queries {

  case class Q(run: (SparkSession, String) => DataFrame, oracle: Option[String])

  private val D = Tables

  /** Shared query text used by the search-family queries. */
  val searchQuery = "table scan merge"
  val searchTerms: Seq[String] = Search.tokenize(searchQuery).distinct

  // ------------------------------------------------------------ relational core

  private val q1Agg = Q(
    (s, d) => D.lineitem(s, d)
      .groupBy("l_returnflag", "l_linestatus")
      .agg(
        round(sum("l_quantity"), 2).as("sum_qty"),
        round(sum(col("l_extendedprice") * (lit(1.0) - col("l_discount"))), 2).as("revenue"),
        round(avg("l_discount"), 6).as("avg_disc"),
        count(lit(1)).as("cnt"))
      .orderBy("l_returnflag", "l_linestatus"),
    Some("""SELECT l_returnflag, l_linestatus,
           |  round(sum(l_quantity),2) AS sum_qty,
           |  round(sum(l_extendedprice*(1-l_discount)),2) AS revenue,
           |  round(avg(l_discount),6) AS avg_disc,
           |  count(*) AS cnt
           |FROM lineitem GROUP BY l_returnflag, l_linestatus
           |ORDER BY l_returnflag, l_linestatus""".stripMargin))

  private val q3JoinAgg = Q(
    (s, d) => {
      val li = D.lineitem(s, d); val o = D.orders(s, d)
      val c = D.customer(s, d); val n = D.nation(s, d)
      li.join(o, li("l_orderkey") === o("o_orderkey"))
        .join(c, o("o_custkey") === c("c_custkey"))
        .join(broadcast(n), c("c_nationkey") === n("n_nationkey"))
        .groupBy("n_name")
        .agg(round(sum(col("l_extendedprice") * (lit(1.0) - col("l_discount"))), 2).as("revenue"),
             count(lit(1)).as("cnt"))
        .orderBy("n_name")
    },
    Some("""SELECT n_name, round(sum(l_extendedprice*(1-l_discount)),2) AS revenue, count(*) AS cnt
           |FROM lineitem JOIN orders ON l_orderkey = o_orderkey
           |  JOIN customer ON o_custkey = c_custkey
           |  JOIN nation ON c_nationkey = n_nationkey
           |GROUP BY n_name ORDER BY n_name""".stripMargin))

  private val w1RankWindow = Q(
    (s, d) => {
      val w = Window.partitionBy("event_type").orderBy(col("value").desc, col("event_id").asc)
      D.events(s, d)
        .select(col("event_type"), col("event_id"),
                row_number().over(w).cast("long").as("rnk"))
        .filter(col("rnk") <= 3)
        .orderBy("event_type", "rnk")
    },
    Some("""SELECT event_type, event_id, rnk FROM (
           |  SELECT event_type, event_id,
           |    row_number() OVER (PARTITION BY event_type ORDER BY value DESC, event_id) AS rnk
           |  FROM events) WHERE rnk <= 3 ORDER BY event_type, rnk""".stripMargin))

  private val a4WatermarkMax = Q(
    (s, d) => D.events(s, d).agg(
      date_format(max("ts"), "yyyy-MM-dd HH:mm:ss").as("max_ts"),
      count(lit(1)).as("cnt")),
    Some("SELECT strftime(max(ts), '%Y-%m-%d %H:%M:%S') AS max_ts, count(*) AS cnt FROM events"))

  // -------------------------------------------------------------- filter / slice

  private val p3FilterDsl = Q(
    (s, d) => {
      val docs = D.documents(s, d)
      docs.filter(FilterDsl.filterColumn("""lang = "en" and n_chars > "200"""", docs.schema))
        .select("doc_id", "lang", "n_chars").orderBy("doc_id")
    },
    Some("SELECT doc_id, lang, n_chars FROM documents WHERE lang = 'en' AND n_chars > 200 ORDER BY doc_id"))

  private val p8FetchSlice = Q(
    (s, d) => D.documents(s, d)
      .select(col("doc_id"),
              array_join(slice(split(col("text"), " "), 3, 8), " ").as("snippet"))
      .orderBy("doc_id"),
    Some("""SELECT doc_id, array_to_string(list_slice(string_split(text, ' '), 3, 10), ' ') AS snippet
           |FROM documents ORDER BY doc_id""".stripMargin))

  // ------------------------------------------------------- chunk fan-out (M5/F1)

  /** Fixed-size 400/100 char chunks with global sequential ids — the SQL-expressible
    * splitter variant (the recursive splitter is unit-tested for parity instead).
    * Production id assignment uses zipWithIndex (Indexing.buildChunks); the global
    * row_number here keeps the query oracle-checkable at test scale.
    */
  def chunkFanout(s: SparkSession, d: String): DataFrame =
    D.documents(s, d)
      .select(col("doc_id"), col("text"),
        greatest(lit(1L), ceil((length(col("text")) - lit(100)) / lit(300.0)).cast("long")).as("n"))
      .select(col("doc_id"), col("text"),
        explode(sequence(lit(0L), col("n") - 1)).as("chunk_number"))
      .select(
        col("doc_id"), col("chunk_number"),
        expr("substring(text, cast(chunk_number*300 + 1 as int), 400)").as("chunk_text"))
      .withColumn("chunk_id",
        row_number().over(Window.orderBy("doc_id", "chunk_number")).cast("long"))

  private val chunkFanoutSql =
    """SELECT row_number() OVER (ORDER BY doc_id, i) AS chunk_id, doc_id, i AS chunk_number,
      |  substring(text, CAST(i*300 + 1 AS INT), 400) AS chunk_text
      |FROM (SELECT doc_id, text,
      |        unnest(generate_series(0, CAST(greatest(1, ceil((length(text)-100)/300.0)) AS BIGINT) - 1)) AS i
      |      FROM documents)""".stripMargin

  private val m5ChunkFanout = Q(
    (s, d) => chunkFanout(s, d)
      .select("chunk_id", "doc_id", "chunk_number", "chunk_text")
      .orderBy("doc_id", "chunk_number"),
    Some(s"SELECT chunk_id, doc_id, chunk_number, chunk_text FROM ($chunkFanoutSql) ORDER BY doc_id, chunk_number"))

  // --------------------------------------------------------------------- dedup

  private val dedupExact = Q(
    (s, d) => D.documents(s, d)
      .select(col("doc_id"), md5(col("text")).as("h"))
      .withColumn("is_dup",
        (col("doc_id") > min("doc_id").over(Window.partitionBy("h"))).cast("int"))
      .orderBy("doc_id"),
    Some("""SELECT doc_id, md5(text) AS h,
           |  CAST(doc_id > min(doc_id) OVER (PARTITION BY md5(text)) AS INT) AS is_dup
           |FROM documents ORDER BY doc_id""".stripMargin))

  // ------------------------------------------------------------- vector search

  /** Double-precision cosine in DuckDB SQL. `list_cosine_similarity` computes in
    * float32 and diverges from Spark's double math; this form matches bit-for-bit
    * after rounding.
    */
  private def cosSql(v: String, q: String): String =
    s"""list_sum(list_transform(list_zip($v, $q), x -> CAST(x[1] AS DOUBLE) * CAST(x[2] AS DOUBLE))) /
       |    ( sqrt(list_sum(list_transform($v, x -> CAST(x AS DOUBLE)*CAST(x AS DOUBLE)))) *
       |      sqrt(list_sum(list_transform($q, x -> CAST(x AS DOUBLE)*CAST(x AS DOUBLE)))) )""".stripMargin

  private def queryVec(s: SparkSession, d: String): Array[Float] =
    D.embeddings(s, d).filter(col("vec_id") === 0)
      .select("embedding").head().getSeq[Float](0).toArray

  private val t1VectorTopK = Q(
    (s, d) => {
      val emb = D.embeddings(s, d).filter(col("vec_id") =!= 0)
      Search.vectorTopK(emb, "embedding", queryVec(s, d), 10, "cosine", idCol = "vec_id")
        .select(col("vec_id"), round(-col("score"), 6).as("sim"))
        .orderBy(col("sim").desc, col("vec_id").asc)
    },
    Some(s"""WITH q AS (SELECT embedding AS e FROM embeddings WHERE vec_id = 0),
            |scored AS (
            |  SELECT vec_id, ${cosSql("embedding", "(SELECT e FROM q)")} AS s
            |  FROM embeddings WHERE vec_id <> 0),
            |topk AS (SELECT vec_id, s FROM scored ORDER BY s DESC, vec_id LIMIT 10)
            |SELECT vec_id, round(s, 6) AS sim FROM topk ORDER BY round(s, 6) DESC, vec_id""".stripMargin))

  // ---------------------------------------------------------------------- BM25

  /** DuckDB CTEs computing BM25 (k1=1.2, b=0.75) over `documents` for searchTerms. */
  private def bm25Sql(conjunctive: Boolean, k: Int): String = {
    val termList = searchTerms.map(t => s"'$t'").mkString(", ")
    val gate = if (conjunctive) s"WHERE matched = ${searchTerms.length}" else ""
    s"""WITH toks AS (
       |  SELECT doc_id, unnest(list_filter(regexp_split_to_array(lower(text), '[^a-z0-9]+'), x -> x <> '')) AS term
       |  FROM documents),
       |dl AS (SELECT doc_id, count(*) AS dlen FROM toks GROUP BY doc_id),
       |corpus AS (SELECT count(*) AS n, avg(dlen) AS avgdl FROM dl),
       |tf AS (SELECT doc_id, term, count(*) AS tf FROM toks WHERE term IN ($termList) GROUP BY doc_id, term),
       |df AS (SELECT term, count(DISTINCT doc_id) AS df FROM tf GROUP BY term),
       |scored AS (
       |  SELECT tf.doc_id,
       |    sum( ln(1 + (corpus.n - df.df + 0.5)/(df.df + 0.5))
       |         * (tf.tf*(1.2+1))/(tf.tf + 1.2*(1 - 0.75 + 0.75*dl.dlen/corpus.avgdl)) ) AS score,
       |    count(DISTINCT tf.term) AS matched
       |  FROM tf JOIN df USING(term) JOIN dl USING(doc_id) CROSS JOIN corpus
       |  GROUP BY tf.doc_id),
       |gated AS (SELECT doc_id, score FROM scored $gate),
       |topk AS (SELECT doc_id, score FROM gated ORDER BY round(score,5) DESC, doc_id LIMIT $k)
       |SELECT doc_id, round(score,5) AS score FROM topk""".stripMargin
  }

  private def bm25Spark(s: SparkSession, d: String, conjunctive: Boolean, k: Int): DataFrame =
    Search.bm25TopK(D.documents(s, d), "doc_id", "text", searchQuery, k, conjunctive = conjunctive)
      .select(col("docId").as("doc_id"), round(col("score"), 5).as("score"))
      .orderBy(col("score").desc, col("doc_id").asc)

  private val t2Bm25TopK = Q(
    (s, d) => bm25Spark(s, d, conjunctive = true, 10),
    Some(bm25Sql(conjunctive = true, 10) + " ORDER BY score DESC, doc_id"))

  // ----------------------------------------------------------------------- RRF

  private val a1RrfFusion = Q(
    (s, d) => {
      import graft.plans.VectorFunctions.cosineF
      val emb = D.embeddings(s, d)
      val vecList = emb
        .select(col("vec_id").as("id"),
                round(cosineF(col("embedding"), typedLit(queryVec(s, d))), 6).as("s"))
        .orderBy(col("s").desc, col("id").asc).limit(20)
      val bmList = bm25Spark(s, d, conjunctive = false, 20)
        .select(col("doc_id").as("id"), col("score").as("s"))
      Search.rrfFuse(Seq(vecList, bmList), "id", "s", Seq(false, false), 60, 10)
        .select(col("id"), round(col("rrfScore"), 6).as("rrf_score"),
                col("bestRank").cast("long").as("best_rank"))
        .orderBy(col("rrf_score").desc, col("id").asc)
    },
    Some(s"""WITH q AS (SELECT embedding AS e FROM embeddings WHERE vec_id = 0),
            |vscored AS (
            |  SELECT vec_id AS id, round(${cosSql("embedding", "(SELECT e FROM q)")}, 6) AS s
            |  FROM embeddings),
            |vtop AS (SELECT id, s FROM vscored ORDER BY s DESC, id LIMIT 20),
            |vrank AS (SELECT id, row_number() OVER (ORDER BY s DESC, id) AS rank FROM vtop),
            |btop AS (${bm25Sql(conjunctive = false, 20).replace("\n", "\n  ")}),
            |brank AS (SELECT doc_id AS id, row_number() OVER (ORDER BY score DESC, doc_id) AS rank FROM btop),
            |allr AS (SELECT * FROM vrank UNION ALL SELECT * FROM brank),
            |fused AS (SELECT id, sum(1.0/(60+rank)) AS rrf, min(rank) AS best_rank FROM allr GROUP BY id)
            |SELECT id, round(rrf, 6) AS rrf_score, best_rank FROM fused
            |ORDER BY round(rrf, 6) DESC, id LIMIT 10""".stripMargin))

  // ------------------------------------------------- chunk→document grouping (A2)

  private val a2GroupDocs = Q(
    (s, d) => {
      val chunks = chunkFanout(s, d).select("chunk_id", "doc_id", "chunk_text")
      val ranked = Search
        .bm25TopK(chunks, "chunk_id", "chunk_text", searchQuery, 30, conjunctive = false)
        .select(col("docId").as("chunk_id"), round(col("score"), 5).as("score"))
        .withColumn("rank", row_number().over(
          Window.orderBy(col("score").desc, col("chunk_id").asc)).cast("long"))
      ranked.join(chunks.select("chunk_id", "doc_id"), "chunk_id")
        .groupBy("doc_id")
        .agg(min("rank").as("doc_rank"), count(lit(1)).as("matched_chunks"))
        .orderBy(col("doc_rank").asc, col("doc_id").asc)
        .limit(10)
    },
    Some(s"""WITH chunks AS ($chunkFanoutSql),
            |toks AS (
            |  SELECT chunk_id, unnest(list_filter(regexp_split_to_array(lower(chunk_text), '[^a-z0-9]+'), x -> x <> '')) AS term
            |  FROM chunks),
            |dl AS (SELECT chunk_id, count(*) AS dlen FROM toks GROUP BY chunk_id),
            |corpus AS (SELECT count(*) AS n, avg(dlen) AS avgdl FROM dl),
            |tf AS (SELECT chunk_id, term, count(*) AS tf FROM toks
            |       WHERE term IN (${searchTerms.map(t => s"'$t'").mkString(", ")}) GROUP BY chunk_id, term),
            |df AS (SELECT term, count(DISTINCT chunk_id) AS df FROM tf GROUP BY term),
            |scored AS (
            |  SELECT tf.chunk_id,
            |    sum( ln(1 + (corpus.n - df.df + 0.5)/(df.df + 0.5))
            |         * (tf.tf*(1.2+1))/(tf.tf + 1.2*(1 - 0.75 + 0.75*dl.dlen/corpus.avgdl)) ) AS score
            |  FROM tf JOIN df USING(term) JOIN dl USING(chunk_id) CROSS JOIN corpus
            |  GROUP BY tf.chunk_id),
            |topc AS (SELECT chunk_id, score FROM scored ORDER BY round(score,5) DESC, chunk_id LIMIT 30),
            |ranked AS (SELECT chunk_id, row_number() OVER (ORDER BY round(score,5) DESC, chunk_id) AS rank FROM topc)
            |SELECT c.doc_id, min(r.rank) AS doc_rank, count(*) AS matched_chunks
            |FROM ranked r JOIN chunks c USING(chunk_id)
            |GROUP BY c.doc_id ORDER BY doc_rank, c.doc_id LIMIT 10""".stripMargin))

  // ------------------------------------------------------------------ registry

  val all: Map[String, Q] = Map(
    "q1_agg" -> q1Agg,
    "q3_join_agg" -> q3JoinAgg,
    "w1_rank_window" -> w1RankWindow,
    "a4_watermark_max" -> a4WatermarkMax,
    "p3_filter_dsl" -> p3FilterDsl,
    "p8_fetch_slice" -> p8FetchSlice,
    "m5_chunk_fanout" -> m5ChunkFanout,
    "dedup_exact" -> dedupExact,
    "t1_vector_topk" -> t1VectorTopK,
    "t2_bm25_topk" -> t2Bm25TopK,
    "a1_rrf_fusion" -> a1RrfFusion,
    "a2_group_docs" -> a2GroupDocs)

  /** Flagship: end-to-end collection build + hybrid search on the documents table. */
  def flagship(spark: SparkSession, sfDir: String): DataFrame = {
    val embedder = HashingEmbedder.default
    val docs = D.documents(spark, sfDir).select(
      col("doc_id").cast("string").as("id"),
      concat(lit("doc://"), col("doc_id")).as("url"),
      map(lit("lang"), col("lang"), lit("source"), col("source")).as("metadata"),
      col("text"))
    val withChunks = graft.operators.Indexing.splitDocuments(
      docs, new graft.functions.TextSplitter(400, 100))
    val chunks = graft.operators.Indexing.buildChunks(withChunks, embedder)
    Search.hybridSearch(chunks, embedder, searchQuery, maxChunks = 15, maxDocs = 5)
  }
}
