package graft

import graft.functions.HashingEmbedder
import graft.operators.Search
import graft.plans.VectorFunctions
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

class SearchSpec extends AnyFunSuite with SparkSuite {
  import spark.implicits._

  test("cosineF / l2SqF / dotF match scala math") {
    val df = Seq(
      (1L, Array(1f, 0f, 0f), Array(1f, 0f, 0f)),
      (2L, Array(1f, 2f, 3f), Array(4f, 5f, 6f)),
      (3L, Array(0f, 0f, 0f), Array(1f, 1f, 1f))).toDF("id", "a", "b")
    val got = df.select($"id",
      VectorFunctions.cosineF($"a", $"b").as("cos"),
      VectorFunctions.l2SqF($"a", $"b").as("l2"),
      VectorFunctions.dotF($"a", $"b").as("dot"))
      .orderBy("id").collect()
    assert(got(0).getDouble(1) === 1.0)
    assert(math.abs(got(1).getDouble(1) - 32.0 / (math.sqrt(14) * math.sqrt(77))) < 1e-12)
    assert(got(1).getDouble(2) === (9.0 + 9.0 + 9.0))
    assert(got(1).getDouble(3) === 32.0)
    assert(got(2).getDouble(1) === 0.0) // zero-norm guard
  }

  test("vectorTopK returns k nearest by L2 with id tie-break") {
    val df = (1 to 100).map(i => (i.toLong, Array(i.toFloat, 0f))).toDF("chunkId", "embedding")
    val got = Search.vectorTopK(df, "embedding", Array(50f, 0f), 3)
      .select("chunkId").as[Long].collect()
    assert(got.toSet == Set(49L, 50L, 51L))
    assert(got.head == 50L)
  }

  test("bm25TopK conjunctive semantics: all terms must match") {
    val docs = Seq(
      (1L, "spark query engine"),
      (2L, "spark engine"),
      (3L, "query engine fast"),
      (4L, "nothing relevant here")).toDF("id", "text")
    val got = Search.bm25TopK(docs, "id", "text", "spark query", 10)
      .select("docId").as[Long].collect()
    assert(got.toSeq == Seq(1L))
    val dis = Search.bm25TopK(docs, "id", "text", "spark query", 10, conjunctive = false)
      .select("docId").as[Long].collect()
    assert(dis.toSet == Set(1L, 2L, 3L))
  }

  test("maxSimTopK: sum of per-query-vector maxima, rank + tie-break") {
    // doc 1 holds exact matches for both query vectors -> maxsim 2.0;
    // doc 2 matches only q0 exactly (its other vector is orthogonal to q1);
    // doc 3 is orthogonal to everything -> 0.0
    val vecs = Seq(
      (1L, Array(1f, 0f, 0f, 0f)), (1L, Array(0f, 1f, 0f, 0f)),
      (2L, Array(1f, 0f, 0f, 0f)), (2L, Array(0f, 0f, 1f, 0f)),
      (3L, Array(0f, 0f, 0f, 1f))).toDF("doc", "v")
    val qvs = Seq(Array(1f, 0f, 0f, 0f), Array(0f, 1f, 0f, 0f))
    val got = Search.maxSimTopK(vecs, "doc", "v", qvs, 10)
      .select($"doc", $"maxsim").as[(Long, Double)].collect().toSeq
    assert(got === Seq((1L, 2.0), (2L, 1.0), (3L, 0.0)))
  }

  test("maxSimTopK: one aggregate, no join, no explode in the plan") {
    val vecs = (1 to 40).map(i => (i.toLong % 5, Array(i.toFloat, 1f))).toDF("doc", "v")
    val plan = Search.maxSimTopK(vecs, "doc", "v",
        Seq(Array(1f, 0f), Array(0f, 1f)), 3)
      .queryExecution.executedPlan.toString
    assert(!plan.contains("Join"), "maxsim must not join")
    assert(!plan.contains("Generate"), "maxsim must not explode")
    assert(plan.contains("TakeOrderedAndProject"), "top-k must not global-sort")
  }

  test("rrfFuse: reference formula 1/(k+rank), rank from 1") {
    val l1 = Seq((10L, 1.0), (20L, 2.0)).toDF("id", "s") // asc: 10 rank1, 20 rank2
    val l2 = Seq((20L, 9.0), (30L, 8.0)).toDF("id", "s") // desc: 20 rank1, 30 rank2
    val got = Search.rrfFuse(Seq(l1, l2), "id", "s", Seq(true, false))
      .select($"id", $"rrfScore").as[(Long, Double)].collect().toMap
    assert(math.abs(got(20L) - (1.0 / 62 + 1.0 / 61)) < 1e-12)
    assert(math.abs(got(10L) - 1.0 / 61) < 1e-12)
    assert(math.abs(got(30L) - 1.0 / 62) < 1e-12)
  }

  test("hybrid search end-to-end on synthetic docs") {
    val embedder = new HashingEmbedder(16)
    val docs = Seq(
      ("d1", "url1", Map("k" -> "v"), "alpha beta gamma delta epsilon zeta"),
      ("d2", "url2", Map("k" -> "v"), "alpha beta totally different words here"),
      ("d3", "url3", Map("k" -> "v"), "unrelated content about nothing"))
      .toDF("id", "url", "metadata", "text")
    val withChunks = graft.operators.Indexing.splitDocuments(
      docs, new graft.functions.TextSplitter(20, 5))
    val chunks = graft.operators.Indexing.buildChunks(withChunks, embedder)
    assert(chunks.count() > 3)
    // sequential ids from 0
    val ids = chunks.select("chunkId").as[Long].collect().sorted
    assert(ids.toSeq == (0L until ids.length).toSeq)
    val res = Search.hybridSearch(chunks, embedder, "alpha beta", maxChunks = 5, maxDocs = 2)
    val top = res.select("documentId").as[String].collect()
    assert(top.nonEmpty && top.length <= 2)
    assert(Set("d1", "d2").contains(top.head))
  }

  test("metadata filter pushdown into hybrid search") {
    val embedder = new HashingEmbedder(16)
    val docs = Seq(
      ("d1", "u", Map("space" -> "ENG"), "alpha beta gamma"),
      ("d2", "u", Map("space" -> "OPS"), "alpha beta delta"))
      .toDF("id", "url", "metadata", "text")
    val chunks = graft.operators.Indexing.buildChunks(
      graft.operators.Indexing.splitDocuments(docs, new graft.functions.TextSplitter(50, 10)),
      embedder)
    val res = Search.hybridSearch(chunks, embedder, "alpha beta",
      maxChunks = 5, maxDocs = 5, metadataFilter = Some("""space = "ENG""""))
    val got = res.select("documentId").as[String].collect()
    assert(got.toSet == Set("d1"))
  }
}
