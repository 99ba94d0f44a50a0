package graft

import graft.operators.QueryLang
import graft.operators.QueryLang._
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

class QueryLangSpec extends AnyFunSuite with SparkSuite {
  import spark.implicits._

  private def docs = Seq(
    (1L, "spark shuffle spark join python tips"),
    (2L, "spark shuffle only here"),
    (3L, "join heavy join text join"),
    (4L, "nothing relevant"),
    (5L, "SPARK Join mixed CASE")).toDF("doc_id", "text")

  // ---------------------------------------------------------------- parser

  test("parser: precedence NOT > AND > OR, parens, implicit AND, case-insensitive keywords") {
    assert(parse("a AND b OR c") === Or(And(Term("a"), Term("b")), Term("c")))
    assert(parse("a OR b AND c") === Or(Term("a"), And(Term("b"), Term("c"))))
    assert(parse("a AND (b OR c)") === And(Term("a"), Or(Term("b"), Term("c"))))
    assert(parse("NOT a AND b") === And(Not(Term("a")), Term("b")))
    assert(parse("a b") === And(Term("a"), Term("b"))) // implicit AND
    assert(parse("a and not b") === And(Term("a"), Not(Term("b"))))
    assert(parse("A") === Term("a")) // terms lowercase
    intercept[IllegalArgumentException](parse("a AND (b"))
    intercept[IllegalArgumentException](parse("AND a"))
  }

  test("booleanSearch: nested query with NOT; rank by matches then tf") {
    val out = QueryLang.booleanSearch(docs, "doc_id", "text",
        "(spark AND join) OR (join NOT python)", k = 10)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    // positive terms = {join, spark} (python only occurs negated). doc1:
    // clause1 matches despite python (OR); tf = spark×2 + join×1. doc5:
    // case-folded spark+join. doc3: join NOT python. doc2: no join → out.
    assert(out.toSeq === Seq((1L, 2L, 3L), (5L, 2L, 2L), (3L, 1L, 3L)))
  }

  test("minSpanSearch: smallest window covering all terms, earliest on ties") {
    val d = Seq(
      (1L, "a x x b y a b"),   // windows: [1..4]=4, [6..7]=2 → 2 @ 6
      (2L, "b a"),             // 2 @ 1
      (3L, "a only here"),     // missing b → dropped
      (4L, "x a b x a x x b")) // min 2 @ 2
      .toDF("doc_id", "text")
    val out = QueryLang.minSpanSearch(d, "doc_id", "text", Seq("a", "b"), k = 10)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    assert(out.toSeq === Seq((1L, 2L, 6L), (2L, 2L, 1L), (4L, 2L, 2L)))
  }

  test("NEAR from postings equals the min-span scan, window cut applied") {
    val d = Seq(
      (1L, "a x x b y a b"),
      (2L, "b a"),
      (3L, "a only here"),
      (4L, "x a z z z z b x")) // min span 6 > window
      .toDF("doc_id", "text")
    val postings = QueryLang.positionalPostings(d, "doc_id", "text")
    val near = QueryLang.nearSearchPostings(postings, Seq("a", "b"), window = 3, k = 10)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    val scan = QueryLang.minSpanSearch(d, "doc_id", "text", Seq("a", "b"), k = 10)
      .where(col("span_len") <= 3)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    assert(near.toSeq === scan.toSeq)
    assert(near.toSeq === Seq((1L, 2L, 6L), (2L, 2L, 1L))) // doc 4 cut by the window
  }

  test("phraseSearch: occurrence count + first position; scan == postings path") {
    val d = Seq(
      (1L, "the quick brown fox and the quick brown cat"),
      (2L, "quick brown quick brown quick brown"),
      (3L, "the brown quick fox"),
      (4L, "quick Brown")) // case-insensitive
      .toDF("doc_id", "text")
    val phrase = Seq("quick", "brown")
    val scan = QueryLang.phraseSearch(d, "doc_id", "text", phrase, k = 10)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    assert(scan.toSeq === Seq((2L, 3L, 1L), (1L, 2L, 2L), (4L, 1L, 1L)))
    val postings = QueryLang.positionalPostings(d, "doc_id", "text")
    val viaIdx = QueryLang.phraseSearchPostings(postings, phrase, k = 10)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    assert(viaIdx.toSeq === scan.toSeq, "postings path must equal the scan path")
  }

  test("phrase with a REPEATED word intersects every offset it occupies") {
    val d = Seq(
      (1L, "go go go stop"),   // "go go" at 1,2
      (2L, "go stop go")).toDF("doc_id", "text")
    val phrase = Seq("go", "go")
    val scan = QueryLang.phraseSearch(d, "doc_id", "text", phrase, k = 10)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    assert(scan.toSeq === Seq((1L, 2L, 1L)))
    val postings = QueryLang.positionalPostings(d, "doc_id", "text")
    val viaIdx = QueryLang.phraseSearchPostings(postings, phrase, k = 10)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    assert(viaIdx.toSeq === scan.toSeq)
  }

  test("parser: quoted phrase atoms") {
    assert(parse("\"hash join\" OR spark") ===
      Or(Phrase(Seq("hash", "join")), Term("spark")))
    assert(parse("a AND NOT \"b c d\"") ===
      And(Term("a"), Not(Phrase(Seq("b", "c", "d")))))
    assert(parse("\"single\"") === Term("single")) // 1-word phrase is a term
    intercept[IllegalArgumentException](parse("\"unclosed"))
  }

  test("parser: NEAR atoms with optional window and phrase operands") {
    assert(parse("NEAR(a b, 5)") === Near(Seq(Seq("a"), Seq("b")), 5))
    assert(parse("NEAR(a b c)") === Near(Seq(Seq("a"), Seq("b"), Seq("c")), 10)) // FTS5 default
    assert(parse("NEAR(a b, 5) AND c") === And(Near(Seq(Seq("a"), Seq("b")), 5), Term("c")))
    assert(parse("near(A B, 3)") === Near(Seq(Seq("a"), Seq("b")), 3)) // case-insensitive kw
    assert(parse("near spark") === And(Term("near"), Term("spark"))) // bare word stays a term
    // quoted phrases are operands, exactly like FTS5's NEAR over phrases
    assert(parse("NEAR(\"a b\" c, 4)") === Near(Seq(Seq("a", "b"), Seq("c")), 4))
    intercept[IllegalArgumentException](parse("NEAR(a b, 1)"))  // window can't hold operands
    intercept[IllegalArgumentException](parse("NEAR(\"a b\" c, 2)")) // ditto with a phrase
    intercept[IllegalArgumentException](parse("NEAR(a b, x)"))  // non-integer window
    intercept[IllegalArgumentException](parse("NEAR(a b"))      // unclosed
  }

  test("NEAR atoms inside boolean MATCH: scan and index paths agree") {
    val dir = java.nio.file.Files.createTempDirectory("graft-nearatom").toString
    val idx = new graft.operators.Bm25Indexer(spark, dir, chunksPath = s"$dir/unused")
    val asChunks = docs.select(col("doc_id").as("chunkId"), col("text").as("indexedData"))
    idx.index(asChunks)
    idx.buildPhraseIndex(asChunks) // NEAR atoms resolve via the positional artifact
    for (q <- Seq(
        "NEAR(spark join, 4) AND NOT python",
        "NEAR(spark shuffle, 2) OR join",
        "NOT NEAR(spark join, 2) AND spark")) {
      val viaIndex = idx.booleanSearch(q, 100)
        .collect().map(_.getLong(0)).toSet
      val viaScan = docs.withColumn("_t", QueryLang.tokens("text"))
        .where(QueryLang.matchColumn(QueryLang.parse(q), col("_t")))
        .collect().map(_.getLong(0)).toSet
      assert(viaIndex === viaScan, s"query: $q")
    }
    // the fixture's ground truth for one of them, by hand: spark adjacent to
    // join only in docs 1 (pos 3,4) and 5; "NOT NEAR(spark join, 2) AND spark"
    // therefore keeps the spark doc without the adjacency — doc 2
    assert(idx.booleanSearch("NOT NEAR(spark join, 2) AND spark", 100)
      .collect().map(_.getLong(0)).toSet === Set(2L))
  }

  test("prefix atoms (tok*): parse, scan and index paths agree, ranking counts them") {
    assert(parse("vec* AND spark") === And(Prefix("vec"), Term("spark")))
    assert(parse("NOT sh*") === Not(Prefix("sh")))
    assert(parse("a*b") === Term("a*b")) // mid-word star is literal, not a prefix
    assert(parse("*") === Term("*"))     // bare star is a literal token
    val dir = java.nio.file.Files.createTempDirectory("graft-prefix").toString
    val idx = new graft.operators.Bm25Indexer(spark, dir, chunksPath = s"$dir/unused")
    val asChunks = docs.select(col("doc_id").as("chunkId"), col("text").as("indexedData"))
    idx.index(asChunks)
    for (q <- Seq("sh* AND spark", "jo* NOT python", "sh* OR jo*",
                  "spark AND NOT sh*")) {
      val viaIndex = idx.booleanSearch(q, 100).collect().map(_.getLong(0)).toSet
      val viaScan = docs.withColumn("_t", QueryLang.tokens("text"))
        .where(QueryLang.matchColumn(QueryLang.parse(q), col("_t")))
        .collect().map(_.getLong(0)).toSet
      assert(viaIndex === viaScan, s"query: $q")
    }
    // ground truth by hand: tokens starting "jo" = join (docs 1, 3, 5); NOT
    // python drops doc 1
    assert(idx.booleanSearch("jo* NOT python", 100)
      .collect().map(_.getLong(0)).toSet === Set(3L, 5L))
    // scan-path ranking counts a prefix atom once in n_matched and every
    // matching occurrence in tf_total: doc 3 has join×3
    val ranked = QueryLang.booleanSearch(docs, "doc_id", "text", "jo* NOT python", 10)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    assert(ranked.toSeq === Seq((3L, 1L, 3L), (5L, 1L, 1L)))
  }

  test("NEAR with PHRASE operands: the window must hold each operand fully") {
    val d = Seq(
      (1L, "x hash join y y broadcast"), // "hash join" starts 2, ends 3; broadcast 6 → span 5
      (2L, "hash join broadcast"),       // span 3
      (3L, "hash y join broadcast"),     // phrase never occurs
      (4L, "broadcast z z z hash join")) // span 7
      .toDF("doc_id", "text")
    val dir = java.nio.file.Files.createTempDirectory("graft-nearph").toString
    val idx = new graft.operators.Bm25Indexer(spark, dir, chunksPath = s"$dir/unused")
    val asChunks = d.select(col("doc_id").as("chunkId"), col("text").as("indexedData"))
    idx.index(asChunks)
    idx.buildPhraseIndex(asChunks)
    def ids(q: String) = idx.booleanSearch(q, 100).collect().map(_.getLong(0)).toSet
    def scanIds(q: String) = d.withColumn("_t", QueryLang.tokens("text"))
      .where(QueryLang.matchColumn(QueryLang.parse(q), col("_t")))
      .collect().map(_.getLong(0)).toSet
    for (q <- Seq("NEAR(\"hash join\" broadcast, 5)",
                  "NEAR(\"hash join\" broadcast, 3)",
                  "NEAR(\"hash join\" broadcast, 7)")) {
      assert(ids(q) === scanIds(q), s"query: $q")
    }
    assert(ids("NEAR(\"hash join\" broadcast, 5)") === Set(1L, 2L))
    assert(ids("NEAR(\"hash join\" broadcast, 3)") === Set(2L))
    assert(ids("NEAR(\"hash join\" broadcast, 7)") === Set(1L, 2L, 4L))
  }

  test("index boolean MATCH: candidate sets equal the scan path; pure negation rejected") {
    val dir = java.nio.file.Files.createTempDirectory("graft-bool").toString
    val idx = new graft.operators.Bm25Indexer(spark, dir, chunksPath = s"$dir/unused")
    val asChunks = docs.select(col("doc_id").as("chunkId"), col("text").as("indexedData"))
    idx.index(asChunks)
    idx.buildPhraseIndex(asChunks) // phrase atoms resolve via the artifact
    // queries chosen to walk every combine() branch, incl. the symbolic
    // De Morgan folds (¬A∧¬B, A∨¬B) that avoid any universe scan, plus
    // quoted-phrase atoms positive AND negated
    for (q <- Seq(
        "(spark AND join) OR (join NOT python)",
        "spark AND NOT (join OR python)",
        "join AND (python OR NOT spark)",
        "spark AND NOT (NOT join AND NOT python)",
        "\"spark shuffle\" OR (join NOT python)",
        "join AND NOT \"spark shuffle\"")) {
      val viaIndex = idx.booleanSearch(q, 100)
        .collect().map(_.getLong(0)).toSet
      val viaScan = docs.withColumn("_t", QueryLang.tokens("text"))
        .where(QueryLang.matchColumn(QueryLang.parse(q), col("_t")))
        .collect().map(_.getLong(0)).toSet
      assert(viaIndex === viaScan, s"query: $q")
    }
    // a result that IS a complement cannot be served from an index
    intercept[IllegalArgumentException](idx.booleanSearch("NOT spark", 10))
    intercept[IllegalArgumentException](idx.booleanSearch("NOT spark AND NOT join", 10))
  }

  test("collection phrase search: artifact serves, delta arrives, tombstones kill, compact folds") {
    val tmp = java.nio.file.Files.createTempDirectory("graft-phrase").toString
    val cm = new graft.core.CollectionManager(spark, tmp,
      new graft.functions.HashingEmbedder(dim = 16),
      new graft.functions.TextSplitter(80, 10))
    def mk(rows: (String, String)*) = rows.toSeq
      .map { case (id, t) => (id, s"u/$id", Map("lastModifiedAt" -> "2026-01-01T00:00:00"), t) }
      .toDF("id", "url", "metadata", "text")
    cm.create("c", mk(
      "d1" -> "tuning a hash join under skew",
      "d2" -> "broadcast beats hash join twice: hash join wins",
      "d3" -> "unrelated text entirely"))
    cm.buildPhraseIndex("c")
    def hits() = cm.phraseSearch("c", Seq("hash", "join"))
      .collect().map(r => (r.getString(0), r.getLong(1))).toSeq
    assert(hits() === Seq(("d2", 2L), ("d1", 1L)))
    // a doc arriving AFTER the build serves through the positions delta
    cm.update("c", mk("d4" -> "the new hash join arrival"))
    assert(hits() === Seq(("d2", 2L), ("d1", 1L), ("d4", 1L)))
    // deletes act through the shared tombstones
    cm.delete("c", Seq("d2"))
    assert(hits() === Seq(("d1", 1L), ("d4", 1L)))
    // compaction folds the positional delta too; results are unchanged
    assert(cm.bm25TailSegments("c") > 0L)
    cm.compactBm25("c")
    assert(cm.bm25TailSegments("c") === 0L)
    assert(!new java.io.File(s"$tmp/c/indexes/bm25/positions_delta").exists)
    assert(hits() === Seq(("d1", 1L), ("d4", 1L)))
  }

  test("MATCH family composes with the metadata-filter DSL; doc-level roll-ups") {
    val tmp = java.nio.file.Files.createTempDirectory("graft-matchf").toString
    val cm = new graft.core.CollectionManager(spark, tmp,
      new graft.functions.HashingEmbedder(dim = 16),
      new graft.functions.TextSplitter(80, 10))
    def mk(rows: (String, String, String)*) = rows.toSeq
      .map { case (id, sp, t) =>
        (id, s"u/$id", Map("space" -> sp, "lastModifiedAt" -> "2026-01-01T00:00:00"), t) }
      .toDF("id", "url", "metadata", "text")
    cm.create("f", mk(
      ("d1", "ENG", "alpha hash join python"),
      ("d2", "ENG", "alpha hash join clean"),
      ("d3", "OPS", "alpha hash join other"),
      ("d4", "ENG", "nothing to see")))
    cm.buildPhraseIndex("f")
    val idOf = cm.chunks("f").select("chunkId", "documentId").collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap

    // boolean MATCH: candidates evaluate over the FULL corpus, THEN the
    // filter gates them (the reference's doc_id IN (...) composition) —
    // "alpha NOT python" = {d2,d3}; space=ENG keeps d2 only
    assert(cm.booleanSearch("f", "alpha NOT python", 10).collect()
      .map(r => idOf(r.getLong(0))).toSet === Set("d2", "d3"))
    assert(cm.booleanSearch("f", "alpha NOT python", 10, Some("space = \"ENG\""))
      .collect().map(r => idOf(r.getLong(0))).toSet === Set("d2"))

    // NEAR and phrase compose with the same gate
    assert(cm.nearSearch("f", Seq("hash", "join"), 3, 10, Some("space = \"ENG\""))
      .collect().map(r => idOf(r.getLong(0))).toSet === Set("d1", "d2"))
    assert(cm.phraseSearch("f", Seq("hash", "join"), 10, Some("space = \"ENG\""))
      .collect().map(_.getString(0)).toSet === Set("d1", "d2"))

    // document-level roll-ups: best chunk carries the doc (score for MATCH,
    // tightest span for NEAR); filters compose unchanged
    val bd = cm.booleanSearchDocs("f", "alpha", 10)
    assert(bd.columns.toSeq === Seq("documentId", "score"))
    assert(bd.collect().map(_.getString(0)).toSet === Set("d1", "d2", "d3"))
    assert(cm.booleanSearchDocs("f", "alpha", 10, Some("space = \"ENG\""))
      .collect().map(_.getString(0)).toSet === Set("d1", "d2"))
    assert(cm.nearSearchDocs("f", Seq("hash", "join"), 3, 10, Some("space = \"ENG\""))
      .collect().map(r => (r.getString(0), r.getLong(1))).toSet ===
      Set(("d1", 2L), ("d2", 2L)))
  }

  test("tokenization ownership: scan is space-split, index is [^a-z0-9]+; tokenizer param aligns them") {
    val d = Seq(
      (1L, "hash-join beats sort"),
      (2L, "hash join beats sort")).toDF("doc_id", "text")
    // scan default: "hash-join" stays ONE token — doc 1 does not match `hash`
    assert(QueryLang.booleanSearch(d, "doc_id", "text", "hash", 10)
      .collect().map(_.getLong(0)).toSet === Set(2L))
    // index path: the BM25 tokenizer splits on [^a-z0-9]+ — doc 1 DOES match
    val dir = java.nio.file.Files.createTempDirectory("graft-tok").toString
    val idx = new graft.operators.Bm25Indexer(spark, dir, chunksPath = s"$dir/unused")
    idx.index(d.select(col("doc_id").as("chunkId"), col("text").as("indexedData")))
    assert(idx.booleanSearch("hash", 10).collect().map(_.getLong(0)).toSet ===
      Set(1L, 2L))
    // passing the index tokenizer into the scan aligns the two paths
    assert(QueryLang.booleanSearch(d, "doc_id", "text", "hash", 10,
        tokenizer = graft.operators.Search.tokensCol)
      .collect().map(_.getLong(0)).toSet === Set(1L, 2L))
  }

  test("phrase/boolean plans stay scan-shaped: no shuffle before the top-k") {
    val real = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    val q = QueryLang.phraseSearch(real, "doc_id", "text", Seq("the", "data"), 5)
    q.collect() // finalize the adaptive plan
    val plan = q.queryExecution.executedPlan.toString
    // a TakeOrderedAndProject directly over the scan/filter/project chain
    assert(plan.contains("TakeOrderedAndProject"), s"plan:\n$plan")
    assert(!plan.contains("Exchange hashpartitioning"),
      s"unexpected mid-plan shuffle:\n$plan")
  }
}
