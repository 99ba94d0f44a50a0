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
    assert(parse("NEAR(a b, 5)") === Near(Seq(NearOp(Seq("a")), NearOp(Seq("b"))), 5))
    assert(parse("NEAR(a b c)") ===
      Near(Seq(NearOp(Seq("a")), NearOp(Seq("b")), NearOp(Seq("c"))), 10)) // FTS5 default
    assert(parse("NEAR(a b, 5) AND c") ===
      And(Near(Seq(NearOp(Seq("a")), NearOp(Seq("b"))), 5), Term("c")))
    assert(parse("near(A B, 3)") ===
      Near(Seq(NearOp(Seq("a")), NearOp(Seq("b"))), 3)) // case-insensitive kw
    assert(parse("near spark") === And(Term("near"), Term("spark"))) // bare word stays a term
    // quoted phrases are operands, exactly like FTS5's NEAR over phrases
    assert(parse("NEAR(\"a b\" c, 4)") ===
      Near(Seq(NearOp(Seq("a", "b")), NearOp(Seq("c"))), 4))
    intercept[IllegalArgumentException](parse("NEAR(a b, x)"))  // non-integer window
    intercept[IllegalArgumentException](parse("NEAR(a b"))      // unclosed
    // boolean keywords inside the operand list are a syntax error (FTS5
    // raises too) — NOT a proximity query over the tokens 'and'/'or'/'not'
    intercept[IllegalArgumentException](parse("NEAR(a AND b, 5)"))
    intercept[IllegalArgumentException](parse("NEAR(a or b)"))
    intercept[IllegalArgumentException](parse("NEAR(not b, 5)"))
  }

  test("NEAR window rule: reject only windows below the longest operand; sub-sum windows just match nothing") {
    // ONE rule for explicit and default windows: window >= longest operand
    intercept[IllegalArgumentException](parse("NEAR(\"a b c\" d, 2)")) // 3-token operand, window 2
    intercept[IllegalArgumentException](parse(
      "NEAR(\"a b c d e f g h i j k\" x)")) // 11-token operand vs DEFAULT window 10
    // windows >= longest operand but < the operand sum are VALID — overlapping
    // operands can satisfy them (ADVICE r13): NEAR(a "a b", 2) holds where
    // "a b" occurs (term a overlaps the phrase start)
    assert(parse("NEAR(a \"a b\", 2)") ===
      Near(Seq(NearOp(Seq("a")), NearOp(Seq("a", "b"))), 2))
    val d = Seq(
      (1L, "a b x"),   // overlap: both operands inside [1,2]
      (2L, "b a x"),   // phrase "a b" never occurs
      (3L, "x a y b")) // phrase "a b" never occurs
      .toDF("doc_id", "text")
    val node = parse("NEAR(a \"a b\", 2)")
    assert(d.withColumn("_t", QueryLang.tokens("text"))
      .where(QueryLang.matchColumn(node, col("_t")))
      .collect().map(_.getLong(0)).toSet === Set(1L))
    // non-overlapping operands in a sub-sum window: parse OK, matches nothing
    // — on the scan AND the index path (no silent widening on either)
    val none = parse("NEAR(a b, 1)")
    assert(d.withColumn("_t", QueryLang.tokens("text"))
      .where(QueryLang.matchColumn(none, col("_t"))).count() === 0L)
    val dir = java.nio.file.Files.createTempDirectory("graft-nearwin").toString
    val idx = new graft.operators.Bm25Indexer(spark, dir, chunksPath = s"$dir/unused")
    val asChunks = d.select(col("doc_id").as("chunkId"), col("text").as("indexedData"))
    idx.index(asChunks)
    idx.buildPhraseIndex(asChunks)
    assert(idx.booleanSearch("NEAR(a b, 1)", 10).count() === 0L)
    assert(idx.booleanSearch("NEAR(a \"a b\", 2)", 10)
      .collect().map(_.getLong(0)).toSet === Set(1L))
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

    // includeSnippet: the best highlight window of the hit's own text for
    // the POSITIVE atoms — negated atoms don't highlight; prefix stems do
    val snips = cm.booleanSearchDocs("f", "alpha NOT python", 10, None,
      includeSnippet = true)
    assert(snips.columns.toSeq === Seq("documentId", "score", "snippet"))
    val byDoc = snips.collect().map(r => r.getString(0) -> r.getString(2)).toMap
    assert(byDoc.keySet === Set("d2", "d3"))
    assert(byDoc.values.forall(s => s != null && s.contains("alpha")))
    val chunkSnips = cm.booleanSearch("f", "al* AND NOT python", 10, None,
      includeSnippet = true)
    assert(chunkSnips.columns.toSeq === Seq("chunkId", "score", "snippet"))
    assert(chunkSnips.collect().forall(_.getString(2).contains("alpha")))
    // near/phrase doc roll-ups carry snippets too (terms = the query words),
    // keeping their own ranking order (span asc / tf desc)
    val ns = cm.nearSearchDocs("f", Seq("hash", "join"), 3, 10, None,
      includeSnippet = true).collect()
    assert(ns.forall(r => r.getString(3).contains("hash")))
    assert(ns.map(_.getLong(1)).toSeq === ns.map(_.getLong(1)).toSeq.sorted)
    val ps = cm.phraseSearch("f", Seq("hash", "join"), 10, None,
      includeSnippet = true).collect()
    assert(ps.forall(r => r.getString(3).contains("join")))
  }

  test("MATCH as a fusion participant: matchQuery gates every index before RRF") {
    val tmp = java.nio.file.Files.createTempDirectory("graft-matchfuse").toString
    val cm = new graft.core.CollectionManager(spark, tmp,
      new graft.functions.HashingEmbedder(dim = 16),
      new graft.functions.TextSplitter(80, 10))
    def mk(rows: (String, String)*) = rows.toSeq
      .map { case (id, t) => (id, s"u/$id", Map("lastModifiedAt" -> "2026-01-01T00:00:00"), t) }
      .toDF("id", "url", "metadata", "text")
    cm.create("g", mk(
      "d1" -> "alpha beta hash join plan",
      "d2" -> "alpha beta vector search plan",
      "d3" -> "alpha beta mixed content plan",
      "d4" -> "unrelated entirely"))
    // ungated: the hybrid search ranks from all docs; gated by a MATCH
    // restriction, only candidate docs can appear — across BOTH indexes
    val all = cm.search("g", "alpha beta plan", maxChunks = 20, maxDocs = 10)
      .collect().map(_.getAs[String]("documentId")).toSet
    assert(all.contains("d1") && all.contains("d2") && all.contains("d3"))
    val gated = cm.search("g", "alpha beta plan", maxChunks = 20, maxDocs = 10,
        matchQuery = Some("alpha NOT hash"))
      .collect().map(_.getAs[String]("documentId")).toSet
    assert(gated === Set("d2", "d3")) // d1 killed by NOT hash, d4 by alpha
    // prefix atoms ride the same gate; metadataFilter still composes
    val gatedPre = cm.search("g", "alpha beta plan", maxChunks = 20, maxDocs = 10,
        matchQuery = Some("vec* OR mixed"))
      .collect().map(_.getAs[String]("documentId")).toSet
    assert(gatedPre === Set("d2", "d3"))
    // the single-index path takes the gate too (searchAmong on the one index)
    val vecOnly = cm.search("g", "alpha beta plan", maxChunks = 20, maxDocs = 10,
        indexNames = Some(Seq("vector_exact_l2")),
        matchQuery = Some("alpha NOT hash"))
      .collect().map(_.getAs[String]("documentId")).toSet
    assert(vecOnly === Set("d2", "d3"))
  }

  test("ONE tokenizer: scan default == index tokenizer on punctuated text; space-split is opt-in") {
    val d = Seq(
      (1L, "hash-join beats sort"),
      (2L, "hash join beats sort")).toDF("doc_id", "text")
    // scan DEFAULT is the engine tokenizer ([^a-z0-9]+): "hash-join" splits,
    // so doc 1 matches `hash` — same answer as the index path below (the
    // reference has exactly one tokenizer, FTS5 unicode61)
    assert(QueryLang.booleanSearch(d, "doc_id", "text", "hash", 10)
      .collect().map(_.getLong(0)).toSet === Set(1L, 2L))
    assert(QueryLang.phraseSearch(d, "doc_id", "text", Seq("hash", "join"), 10)
      .collect().map(_.getLong(0)).toSet === Set(1L, 2L))
    // index path agrees
    val dir = java.nio.file.Files.createTempDirectory("graft-tok").toString
    val idx = new graft.operators.Bm25Indexer(spark, dir, chunksPath = s"$dir/unused")
    idx.index(d.select(col("doc_id").as("chunkId"), col("text").as("indexedData")))
    assert(idx.booleanSearch("hash", 10).collect().map(_.getLong(0)).toSet ===
      Set(1L, 2L))
    // the historical space-split is an explicit opt-in parity tokenizer:
    // "hash-join" stays ONE token — doc 1 does not match `hash`
    assert(QueryLang.booleanSearch(d, "doc_id", "text", "hash", 10,
        tokenizer = QueryLang.spaceTokensOf)
      .collect().map(_.getLong(0)).toSet === Set(2L))
  }

  test("ONE tokenizer, query side: punctuated QUERY atoms normalize on the scan path (r16 ADVICE)") {
    val d = Seq(
      (1L, "hash join beats sort"),
      (2L, "hash-join beats sort"),
      (3L, "only join here"),
      (4L, "only hash here")).toDF("doc_id", "text")
    def scanIds(q: String) = QueryLang.booleanSearch(d, "doc_id", "text", q, 10)
      .collect().map(_.getLong(0)).toSet
    // Term("hash-join") → hash AND join under the engine tokenizer — the
    // same answer the index path gives (pre-r16 this compiled to
    // array_contains(_t, "hash-join") and silently returned EMPTY)
    assert(scanIds("hash-join") === Set(1L, 2L))
    // quoted punctuated phrase: words flatMap — "hash-join beats" ≡ "hash join beats"
    assert(scanIds("\"hash-join beats\"") === Set(1L, 2L))
    // NEAR operand that splits widens the operand in place
    assert(scanIds("NEAR(hash-join sort, 5)") === Set(1L, 2L))
    // anchored punctuated word anchors as a PHRASE of its tokens
    assert(scanIds("^hash-join") === Set(1L, 2L))
    // index path agrees on the punctuated ATOM
    val dir = java.nio.file.Files.createTempDirectory("graft-qtok").toString
    val idx = new graft.operators.Bm25Indexer(spark, dir, chunksPath = s"$dir/unused")
    idx.index(d.select(col("doc_id").as("chunkId"), col("text").as("indexedData")))
    assert(idx.booleanSearch("hash-join", 10).collect().map(_.getLong(0)).toSet ===
      Set(1L, 2L))
    // raw-term surfaces normalize too: minSpanSearch covers BOTH tokens of a
    // punctuated term; phraseSearch widens its word list
    assert(QueryLang.minSpanSearch(d, "doc_id", "text", Seq("hash-join"), 10)
      .collect().map(_.getLong(0)).toSet === Set(1L, 2L))
    assert(QueryLang.phraseSearch(d, "doc_id", "text", Seq("hash-join", "beats"), 10)
      .collect().map(_.getLong(0)).toSet === Set(1L, 2L))
    // an atom with NO indexable tokens raises (matching the index path)
    intercept[IllegalArgumentException] {
      QueryLang.booleanSearch(d, "doc_id", "text", "hash AND '''", 10).collect()
    }
    // spaceTokenize is the matching atom tokenizer for the opt-in space
    // tokenizer: "hash-join" stays one atom and matches only literal text
    assert(QueryLang.booleanSearch(d, "doc_id", "text", "hash-join", 10,
        tokenizer = QueryLang.spaceTokensOf,
        atomTokenizer = QueryLang.spaceTokenize)
      .collect().map(_.getLong(0)).toSet === Set(2L))
  }

  test("double negation / De Morgan: index path matches scan on NOT NOT and NOT(NOT..AND NOT..)") {
    // minimized from the r15 lifecycle property counterexample (seed 37):
    // `NOT NOT b*` had a non-empty candidate set but zero positive atoms,
    // so booleanHits returned an EMPTY frame while the scan path matched.
    // NNF before atom collection + candidate evaluation fixes the class.
    val d = Seq(
      (1L, "bx ax"), (2L, "ax only"), (3L, "by here"), (4L, "cx dx"))
      .toDF("doc_id", "text")
    val dir = java.nio.file.Files.createTempDirectory("graft-nnf").toString
    val idx = new graft.operators.Bm25Indexer(spark, dir, chunksPath = s"$dir/unused")
    idx.index(d.select(col("doc_id").as("chunkId"), col("text").as("indexedData")))
    def scanIds2(q: String) = QueryLang.booleanSearch(d, "doc_id", "text", q, 10)
      .collect().map(_.getLong(0)).toSet
    def idxIds(q: String) = idx.booleanSearch(q, 10)
      .collect().map(_.getLong(0)).toSet
    assert(scanIds2("NOT NOT b*") === Set(1L, 3L))
    assert(idxIds("NOT NOT b*") === Set(1L, 3L))
    assert(scanIds2("NOT (NOT ax AND NOT by)") === Set(1L, 2L, 3L))
    assert(idxIds("NOT (NOT ax AND NOT by)") === Set(1L, 2L, 3L))
    // pure complements still rejected FTS5-style, even dressed in De Morgan
    intercept[IllegalArgumentException](idx.booleanSearch("NOT bx", 10))
    intercept[IllegalArgumentException](idx.booleanSearch("NOT (bx OR ax)", 10))
  }

  test("MinCoverSpan kernel equals the quadratic reference on random docs (min + earliest tie-break)") {
    // the r15 kernel replaced the declarative candidate-window aggregate;
    // this pins (span_len, span_start) against a brute-force re-derivation
    // of the documented contract: over every start s at a term occurrence,
    // the window ends at the latest first-occurrence-≥s over all terms
    val vocab2 = Vector("a", "b", "c", "d", "e")
    val rnd = new scala.util.Random(17)
    val docs2 = (1 to 120).map { i =>
      (i.toLong, Seq.fill(1 + rnd.nextInt(14))(vocab2(rnd.nextInt(vocab2.size))))
    }
    def ref(toks: Seq[String], terms: Seq[String]): Option[(Long, Long)] = {
      val cands = for {
        s <- toks.indices if terms.contains(toks(s))
        es = terms.map(t => toks.indexWhere(_ == t, s)) if es.forall(_ >= 0)
      } yield (es.max - s + 1, s + 1)
      if (cands.isEmpty) None
      else {
        val minLen = cands.map(_._1).min
        Some((minLen.toLong, cands.filter(_._1 == minLen).map(_._2).min.toLong))
      }
    }
    for (terms <- Seq(Seq("a"), Seq("a", "b"), Seq("a", "b", "c"), Seq("d", "e"))) {
      val got = QueryLang.minSpanSearch(
          docs2.map { case (id, ts) => (id, ts.mkString(" ")) }.toDF("doc_id", "text"),
          "doc_id", "text", terms, k = 1000)
        .collect().map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2)))).toMap
      docs2.foreach { case (id, ts) =>
        assert(got.get(id) === ref(ts, terms),
          s"terms=$terms doc=$id toks=${ts.mkString(" ")}")
      }
    }
  }

  test("parser: bare '^' and abutting text after a quoted phrase are clear syntax errors") {
    // ADVICE r14: a lone '^' token used to parse as Term("^") and die later
    // with a confusing index-path error; whitespace-separated '^ term' was
    // inconsistently rejected while '^ "a b"' was accepted. Now: '^' anchors
    // the NEXT atom uniformly, and non-anchorable successors are rejected.
    assert(parse("^ spark") === First(Term("spark")))
    assert(parse("^ ta*") === First(Prefix("ta")))
    assert(parse("^ \"the fast\"") === First(Phrase(Seq("the", "fast"))))
    assert(parse("^\"the fast\"") === First(Phrase(Seq("the", "fast"))))
    intercept[IllegalArgumentException](parse("^"))
    intercept[IllegalArgumentException](parse("^(a OR b)"))
    intercept[IllegalArgumentException](parse("a AND ^"))
    intercept[IllegalArgumentException](parse("^ AND b"))
    intercept[IllegalArgumentException](parse("^ NEAR(a b, 5)"))
    intercept[IllegalArgumentException](parse("^ ^a"))
    // ADVICE r14: '"a b"*x' used to lex as phrase-prefix AND term x (an
    // implicit AND) where FTS5 raises — now both starred and plain forms
    // require a delimiter after the closing quote
    intercept[IllegalArgumentException](parse("\"a b\"*x"))
    intercept[IllegalArgumentException](parse("\"a b\"x"))
    intercept[IllegalArgumentException](parse("\"a b\"*2"))
    // delimiters and whitespace after the quote stay fine
    assert(parse("(\"a b\")") === Phrase(Seq("a", "b")))
    assert(parse("\"a b\"* c") === And(Phrase(Seq("a", "b"), lastPrefix = true), Term("c")))
    assert(parse("NEAR(\"a b\"* c, 6)") ===
      Near(Seq(NearOp(Seq("a", "b"), lastPrefix = true), NearOp(Seq("c"))), 6))
  }

  test("parser: FTS5 phrase-prefix — trailing * after the closing quote and on NEAR operands") {
    // `"vec sear"*` — prefix on the LAST token of a quoted phrase
    assert(parse("\"vec sear\"*") === Phrase(Seq("vec", "sear"), lastPrefix = true))
    assert(parse("\"vec sear\"* AND spark") ===
      And(Phrase(Seq("vec", "sear"), lastPrefix = true), Term("spark")))
    // a 1-word phrase-prefix IS a prefix atom
    assert(parse("\"vec\"*") === Prefix("vec"))
    // NEAR operands take both forms: bare `vec*` and quoted `"hash jo"*`
    assert(parse("NEAR(spark vec*, 5)") ===
      Near(Seq(NearOp(Seq("spark")), NearOp(Seq("vec"), lastPrefix = true)), 5))
    assert(parse("NEAR(\"hash jo\"* x, 6)") ===
      Near(Seq(NearOp(Seq("hash", "jo"), lastPrefix = true), NearOp(Seq("x"))), 6))
    // a star INSIDE the quotes stays literal text (FTS5's special case is
    // only the trailing position); mid-word stars in operands stay literal
    assert(parse("\"a b* c\"") === Phrase(Seq("a", "b*", "c")))
    assert(parse("NEAR(a*b c, 5)") ===
      Near(Seq(NearOp(Seq("a*b")), NearOp(Seq("c"))), 5))
  }

  test("phrase-prefix: scan and index paths agree; ranking counts the expansion") {
    val d = Seq(
      (1L, "tuning vector search under skew"),
      (2L, "vector searches and vector searching"),
      (3L, "a vector seareverse here"),    // 'seareverse' carries the stem too
      (4L, "search vector reversed order"), // wrong order — no phrase
      (5L, "vector only no second word"),
      (6L, "plain searching text")).toDF("doc_id", "text")
    val dir = java.nio.file.Files.createTempDirectory("graft-phpre").toString
    val idx = new graft.operators.Bm25Indexer(spark, dir, chunksPath = s"$dir/unused")
    val asChunks = d.select(col("doc_id").as("chunkId"), col("text").as("indexedData"))
    idx.index(asChunks)
    idx.buildPhraseIndex(asChunks)
    for (q <- Seq(
        "\"vector sear\"*",
        "\"vector sear\"* AND NOT skew",
        "\"vector sear\"* OR plain",
        "NEAR(tuning sear*, 3)",
        "NEAR(\"vector sear\"* skew, 5)",
        "NEAR(order reve*, 3) OR \"vector sea\"*")) {
      val viaIndex = idx.booleanSearch(q, 100).collect().map(_.getLong(0)).toSet
      val viaScan = d.withColumn("_t", QueryLang.tokens("text"))
        .where(QueryLang.matchColumn(QueryLang.parse(q), col("_t")))
        .collect().map(_.getLong(0)).toSet
      assert(viaIndex === viaScan, s"query: $q")
    }
    // ground truth by hand: "vector sear"* = vector followed by a sear-token
    assert(idx.booleanSearch("\"vector sear\"*", 100)
      .collect().map(_.getLong(0)).toSet === Set(1L, 2L, 3L))
    // the phrase-prefix's last slot counts every matching VOCAB term in the
    // scoring expansion: positive atoms = term 'vector' + stem 'sear'
    val atoms = QueryLang.positiveAtomsOf("\"vector sear\"* AND NOT skew")
    assert(atoms === (Seq("vector"), Seq("sear")))
    // doc-level tf via phraseHitsPostings: doc 2 has TWO occurrences
    // (searches, searching), doc 1 and 3 one each
    val tf = QueryLang.phraseHitsPostings(
        idx.positionsTable(), Seq("vector", "sear"), lastPrefix = true)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toMap
    assert(tf === Map(1L -> 1L, 2L -> 2L, 3L -> 1L))
  }

  test("initial-token anchor (^): parse, scan and index paths agree") {
    // parse forms: bare term, prefix, quoted phrase, phrase-prefix
    assert(parse("^spark") === First(Term("spark")))
    assert(parse("^sp*") === First(Prefix("sp")))
    assert(parse("^\"hash join\"") === First(Phrase(Seq("hash", "join"))))
    assert(parse("^\"hash jo\"*") === First(Phrase(Seq("hash", "jo"), lastPrefix = true)))
    assert(parse("^a AND b") === And(First(Term("a")), Term("b")))
    intercept[IllegalArgumentException](parse("NEAR(^a b, 5)")) // no anchors in NEAR
    intercept[IllegalArgumentException](parse("^NEAR(a b, 5)")) // ^ can't anchor NEAR
    assert(parse("^near spark") === And(First(Term("near")), Term("spark"))) // bare word ok
    val d = Seq(
      (1L, "spark shuffle hash join done"),  // starts with spark; "hash join" at 3
      (2L, "hash join spark follows"),       // starts with the phrase
      (3L, "shuffle spark hash join"),       // spark present, not first
      (4L, "sparkle dust")).toDF("doc_id", "text") // first token carries sp-stem
    val dir = java.nio.file.Files.createTempDirectory("graft-anchor").toString
    val idx = new graft.operators.Bm25Indexer(spark, dir, chunksPath = s"$dir/unused")
    val asChunks = d.select(col("doc_id").as("chunkId"), col("text").as("indexedData"))
    idx.index(asChunks)
    idx.buildPhraseIndex(asChunks) // anchors are POSITION predicates
    for (q <- Seq("^spark", "^sp*", "^\"hash join\"", "^\"hash jo\"*",
                  "^spark OR ^\"hash join\"", "hash AND NOT ^spark")) {
      val viaIndex = idx.booleanSearch(q, 100).collect().map(_.getLong(0)).toSet
      val viaScan = d.withColumn("_t", QueryLang.tokens("text"))
        .where(QueryLang.matchColumn(QueryLang.parse(q), col("_t")))
        .collect().map(_.getLong(0)).toSet
      assert(viaIndex === viaScan, s"query: $q")
    }
    // ground truth: ^spark only doc 1 (doc 3 has it mid-text, doc 4 is a
    // different token); ^sp* adds doc 4; the anchored phrase only doc 2
    assert(idx.booleanSearch("^spark", 100).collect().map(_.getLong(0)).toSet === Set(1L))
    assert(idx.booleanSearch("^sp*", 100).collect().map(_.getLong(0)).toSet === Set(1L, 4L))
    assert(idx.booleanSearch("^\"hash join\"", 100)
      .collect().map(_.getLong(0)).toSet === Set(2L))
    // a bare anchored word that SPLITS under the index tokenizer anchors as
    // a phrase of its tokens (never an unsatisfiable AND of two anchors)
    val d2 = Seq((1L, "hash join first"), (2L, "join hash first")).toDF("doc_id", "text")
    val dir2 = java.nio.file.Files.createTempDirectory("graft-anchor2").toString
    val idx2 = new graft.operators.Bm25Indexer(spark, dir2, chunksPath = s"$dir2/unused")
    val c2 = d2.select(col("doc_id").as("chunkId"), col("text").as("indexedData"))
    idx2.index(c2); idx2.buildPhraseIndex(c2)
    assert(idx2.booleanSearch("^hash-join", 100)
      .collect().map(_.getLong(0)).toSet === Set(1L))
  }

  test("prefix expansion drops the forced broadcast hint; exact-term queries keep it") {
    val dir = java.nio.file.Files.createTempDirectory("graft-bcast").toString
    val idx = new graft.operators.Bm25Indexer(spark, dir, chunksPath = s"$dir/unused")
    val asChunks = docs.select(col("doc_id").as("chunkId"), col("text").as("indexedData"))
    idx.index(asChunks)
    idx.buildPhraseIndex(asChunks) // the phrase-prefix case resolves via positions
    def hintCount(q: String): Int =
      "ResolvedHint".r.findAllIn(
        idx.booleanSearch(q, 10).queryExecution.analyzed.toString).length
    // exact terms: the term-stats side is ≤ |query terms| rows — the forced
    // broadcast stays (stats crossJoin is hinted too, hence ≥ 2)
    assert(hintCount("spark AND join") >= 2)
    // a prefix atom expands the stats side to the matching VOCABULARY — the
    // hint is dropped (only the 1-row corpus-stats hint remains) so AQE can
    // fall back when a wide stem exceeds the broadcast threshold
    assert(hintCount("sh* AND join") === 1)
    assert(hintCount("\"spark sh\"*") === 1) // phrase-prefix counts as expansion
    // results still correct with AQE deciding
    assert(idx.booleanSearch("sh* AND join", 10).count() > 0)
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
