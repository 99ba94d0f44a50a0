package graft

import graft.operators.Suggest
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Query-assist operators: SymSpell spelling suggestion (exactness vs the
  * brute-force cross join — the claim the delete-key join must earn),
  * prefix autocomplete, best-window snippet highlighting (earliest-max
  * hand-checks), and faceted counts.
  */
class SuggestSpec extends AnyFunSuite with SparkSuite {
  import spark.implicits._

  private def vocabDf(terms: (String, Long)*) = terms.toSeq.toDF("term", "term_df")

  test("spellSuggest: hand-checked ranking — distance first, then df, then term") {
    val vocab = vocabDf(("table", 50L), ("cable", 80L), ("tale", 10L), ("tab", 5L),
      ("label", 30L), ("zzzz", 99L))
    val out = Suggest.spellSuggest(vocab, "term", "term_df",
        Seq("tabel").toDF("q"), "q", maxEdits = 2, topK = 4)
      .orderBy("rank")
      .collect().map(r => (r.getString(1), r.getLong(2), r.getLong(4)))
    // plain Levenshtein from "tabel": label=1 (t→l); table=2 (the el swap is
    // 2 substitutions), tale=2, tab=2; cable=3 and zzzz are out of range.
    // dist first, then df desc: table(50) > tale(10) > tab(5).
    assert(out.map(_._1).toSeq === Seq("label", "table", "tale", "tab"))
    assert(out.map(_._2).toSeq === Seq(1L, 2L, 2L, 2L))
    assert(out.map(_._3).toSeq === Seq(1L, 2L, 3L, 4L))
  }

  test("spellSuggest equals the brute-force cross join on random short vocab (maxEdits 1 and 2)") {
    val rnd = new scala.util.Random(7L)
    def word() = Seq.fill(2 + rnd.nextInt(6))("abcde".charAt(rnd.nextInt(5))).mkString
    val vocab = (0 until 120).map(_ => word()).distinct.zipWithIndex
      .map { case (w, i) => (w, (i % 9 + 1).toLong) }
    val queries = (0 until 25).map(_ => word()).distinct
    val vDf = vocab.toDF("term", "term_df")
    val qDf = queries.toDF("q")
    for (e <- Seq(1, 2)) {
      val fast = Suggest.spellSuggest(vDf, "term", "term_df", qDf, "q",
          maxEdits = e, topK = 1000)
        .select("q", "suggestion", "dist").collect()
        .map(r => (r.getString(0), r.getString(1), r.getLong(2))).toSet
      // brute force: every (q, term) pair within distance e
      val brute = (for {
        q <- queries; (t, _) <- vocab
        d = {
          val dp = Array.tabulate(q.length + 1, t.length + 1) { (i, j) =>
            if (i == 0) j else if (j == 0) i else 0 }
          for (i <- 1 to q.length; j <- 1 to t.length)
            dp(i)(j) = math.min(math.min(dp(i - 1)(j) + 1, dp(i)(j - 1) + 1),
              dp(i - 1)(j - 1) + (if (q(i - 1) == t(j - 1)) 0 else 1))
          dp(q.length)(t.length)
        }
        if d <= e
      } yield (q, t, d.toLong)).toSet
      assert(fast === brute, s"maxEdits=$e")
      assert(brute.nonEmpty)
    }
  }

  test("autocomplete: prefix filter + (df desc, term asc) top-k") {
    val vocab = vocabDf(("spark", 9L), ("spill", 9L), ("span", 3L), ("scan", 20L),
      ("join", 50L))
    val out = Suggest.autocomplete(vocab, "term", "term_df", "sp", 2)
      .collect().map(_.getString(0)).toSeq
    assert(out === Seq("spark", "spill")) // df tie → term asc; span cut by k
  }

  test("highlightSnippet: earliest max window, window clamp on short docs, no-hit docs dropped") {
    val docs = Seq(
      (1L, "x x spark y y y spark join z z z"), // best window covers both terms
      (2L, "nothing relevant here at all"),
      (3L, "join end")) // doc shorter than the window
      .toDF("doc_id", "text")
    val out = Suggest.highlightSnippet(docs, "doc_id", "text",
        Seq("spark", "join"), window = 4)
      .orderBy("doc_id")
      .collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2)))
    assert(out.map(_._1).toSeq === Seq(1L, 3L)) // doc 2 has no hits
    val d1 = out.head
    assert(d1._3 === 2L)
    // earliest window with 2 hits: words 7..10? windows: idx 4 = "y y spark join"
    assert(d1._2 === "y y spark join")
    assert(out(1) === ((3L, "join end", 1L))) // clamp: whole short doc is the window
  }

  test("highlightSnippet: punctuated words hit through the engine tokenizer, snippet keeps the original text") {
    // r15 single-tokenizer contract: "hash-join" matches the atom `hash` and
    // the stem `jo*` on the scan and index paths — the highlighter must
    // hit-test the same way, while the SNIPPET still shows the raw word
    val docs = Seq(
      (1L, "x x hash-join beats y z w"),
      (2L, "no relevant words here at all")).toDF("doc_id", "text")
    val byTerm = Suggest.highlightSnippet(docs, "doc_id", "text",
        Seq("hash"), window = 3).collect()
    assert(byTerm.map(_.getLong(0)).toSeq === Seq(1L))
    assert(byTerm.head.getString(1).contains("hash-join"), byTerm.head.getString(1))
    val byStem = Suggest.highlightSnippet(docs, "doc_id", "text",
        Nil, window = 3, stems = Seq("jo")).collect()
    assert(byStem.map(_.getLong(0)).toSeq === Seq(1L))
    assert(byStem.head.getString(1).contains("hash-join"), byStem.head.getString(1))
  }

  test("collection-level suggestions serve from the BM25 termDf LSM view (deltas included)") {
    val tmp = java.nio.file.Files.createTempDirectory("graft-suggest").toString
    val cm = new graft.core.CollectionManager(spark, tmp,
      new graft.functions.HashingEmbedder(dim = 16),
      new graft.functions.TextSplitter(50, 10))
    def docs(rows: (String, String)*) = rows.toSeq
      .map { case (id, t) => (id, s"u/$id", Map("lastModifiedAt" -> "2026-01-01T00:00:00"), t) }
      .toDF("id", "url", "metadata", "text")
    cm.create("c", docs("d1" -> "zeppelin cluster running smoothly"))
    // the word "quantized" arrives only via the INCREMENTAL update — its df
    // lives in a termDf_delta segment until compaction
    cm.update("c", docs("d2" -> "quantized vectors quantized index"))
    val sug = cm.suggestTerms("c", Seq("quantzed", "zepelin"), maxEdits = 2, topK = 1)
      .collect().map(r => (r.getString(0), r.getString(1))).toMap
    assert(sug("quantzed") === "quantized")
    assert(sug("zepelin") === "zeppelin")
    val ac = cm.autocompleteTerms("c", "qu", k = 5)
      .collect().map(_.getString(0)).toSeq
    assert(ac.contains("quantized"))
  }

  test("suggest-key artifact: equals on-the-fly, serves delta terms, never resurrects deleted ones") {
    val tmp = java.nio.file.Files.createTempDirectory("graft-suggest-art").toString
    val cm = new graft.core.CollectionManager(spark, tmp,
      new graft.functions.HashingEmbedder(dim = 16),
      new graft.functions.TextSplitter(50, 10))
    def docs(rows: (String, String)*) = rows.toSeq
      .map { case (id, t) => (id, s"u/$id", Map("lastModifiedAt" -> "2026-01-01T00:00:00"), t) }
      .toDF("id", "url", "metadata", "text")
    cm.create("c", docs("d1" -> "zeppelin cluster running smoothly",
      "d2" -> "quantized vectors quantized index"))
    cm.buildSuggestIndex("c")
    val probes = Seq("zepelin", "quantzed", "gyroscpe")
    def collect() = cm.suggestTerms("c", probes, topK = 2)
      .collect().map(r => (r.getString(0), r.getString(1), r.getLong(4))).toSet
    val withArtifact = collect()
    // artifact path == on-the-fly path, bit for bit
    val fs = org.apache.hadoop.fs.FileSystem.get(spark.sparkContext.hadoopConfiguration)
    val keysDir = new org.apache.hadoop.fs.Path(s"$tmp/c/indexes/bm25/suggest_keys")
    assert(fs.exists(keysDir))
    fs.rename(keysDir, new org.apache.hadoop.fs.Path(s"$tmp/c/indexes/bm25/.keys_hidden"))
    assert(collect() === withArtifact)
    fs.rename(new org.apache.hadoop.fs.Path(s"$tmp/c/indexes/bm25/.keys_hidden"), keysDir)
    // a term arriving AFTER the build suggests via the on-the-fly delta union
    cm.update("c", docs("d3" -> "gyroscope calibration notes gyroscope"))
    val afterUpdate = collect()
    assert(afterUpdate.exists { case (q, s, _) => q == "gyroscpe" && s == "gyroscope" })
    // a deleted doc's unique terms die at the live-df join, stale keys or not
    cm.delete("c", Seq("d2"))
    val afterDelete = collect()
    assert(!afterDelete.exists(_._2 == "quantized"))
    assert(afterDelete.exists { case (q, s, _) => q == "zepelin" && s == "zeppelin" })
    // a 1-edit artifact cannot nominate 2-edit candidates: falls back whole
    cm.buildSuggestIndex("c", maxEdits = 1)
    val wideReq = cm.suggestTerms("c", Seq("zepelinn"), maxEdits = 2, topK = 1)
      .collect().map(_.getString(1)).toSeq
    assert(wideReq === Seq("zeppelin")) // distance 2, only reachable on the fallback
  }

  test("suggest freshness stamp: maintained across the lifecycle; sidecar loss degrades, never breaks") {
    val tmp = java.nio.file.Files.createTempDirectory("graft-suggest-stamp").toString
    val cm = new graft.core.CollectionManager(spark, tmp,
      new graft.functions.HashingEmbedder(dim = 16),
      new graft.functions.TextSplitter(50, 10))
    def docs(rows: (String, String)*) = rows.toSeq
      .map { case (id, t) => (id, s"u/$id", Map("lastModifiedAt" -> "2026-01-01T00:00:00"), t) }
      .toDF("id", "url", "metadata", "text")
    cm.create("c", docs("d1" -> "zeppelin cluster running smoothly"))
    cm.buildSuggestIndex("c")
    def plan(df: org.apache.spark.sql.DataFrame) = df.queryExecution.optimizedPlan.toString
    // fresh artifact (sidecar stamp matches the live termDf state): the keys
    // ARE the vocabulary's keys — no vocab-sized live-vs-artifact anti-join
    val fresh = cm.suggestTerms("c", Seq("zepelin"), topK = 1)
    assert(!plan(fresh).contains("LeftAnti"),
      s"fresh artifact must skip the anti-join:\n${plan(fresh)}")
    assert(fresh.collect().map(_.getString(1)).toSeq === Seq("zeppelin"))
    // an incremental update MAINTAINS the artifact (batch keys appended,
    // sidecar restamped): still no anti-join, and the new term serves from
    // the appended keys alone
    cm.update("c", docs("d2" -> "gyroscope calibration notes"))
    val maintained = cm.suggestTerms("c", Seq("gyroscpe"), topK = 1)
    assert(!plan(maintained).contains("LeftAnti"),
      s"maintained artifact must stay on the fast path:\n${plan(maintained)}")
    assert(maintained.collect().map(_.getString(1)).toSeq === Seq("gyroscope"))
    // appended keys land as DELTA segments the fold triggers can see
    assert(new java.io.File(s"$tmp/c/indexes/bm25/suggest_keys_delta").isDirectory)
    // compaction rebuilds the artifact against the folded vocabulary:
    // duplicate update-appended keys fold, the fast path stays live
    val fs = org.apache.hadoop.fs.FileSystem.get(spark.sparkContext.hadoopConfiguration)
    val meta = new org.apache.hadoop.fs.Path(s"$tmp/c/indexes/bm25/suggest_meta")
    cm.compactBm25("c")
    assert(fs.exists(meta))
    assert(!new java.io.File(s"$tmp/c/indexes/bm25/suggest_keys_delta").exists,
      "compaction must fold the suggest-key delta tail")
    assert(cm.bm25TailSegments("c") === 0L)
    val afterCompact = cm.suggestTerms("c", Seq("gyroscpe", "zepelin"), topK = 1)
    assert(!plan(afterCompact).contains("LeftAnti"))
    assert(afterCompact.collect().map(_.getString(1)).toSet === Set("gyroscope", "zeppelin"))
    // a lost/legacy sidecar degrades to the delta path (anti-join + on-the-fly
    // keys) — slower, never wrong
    assert(fs.delete(meta, false))
    val legacy = cm.suggestTerms("c", Seq("gyroscpe"), topK = 1)
    assert(plan(legacy).contains("LeftAnti"),
      s"sidecar-less artifact must take the delta path:\n${plan(legacy)}")
    assert(legacy.collect().map(_.getString(1)).toSeq === Seq("gyroscope"))
  }

  test("highlightSnippet: query terms with quotes are literals, not SQL splices") {
    val docs = Seq((1L, "she said don't stop now"), (2L, "unrelated words"))
      .toDF("doc_id", "text")
    val out = Suggest.highlightSnippet(docs, "doc_id", "text",
        Seq("don't", "o'brien\\"), window = 3)
      .collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2)))
    assert(out.toSeq === Seq((1L, "she said don't", 1L))) // earliest max window
  }

  test("an EMPTY suggest-key artifact (fully-deleted vocabulary) falls back, no NPE") {
    val tmp = java.nio.file.Files.createTempDirectory("graft-suggest-empty").toString
    val cm = new graft.core.CollectionManager(spark, tmp,
      new graft.functions.HashingEmbedder(dim = 16),
      new graft.functions.TextSplitter(50, 10))
    cm.create("c", Seq(("d1", "u/d1", Map("lastModifiedAt" -> "2026-01-01T00:00:00"),
      "zeppelin cluster")).toDF("id", "url", "metadata", "text"))
    cm.delete("c", Seq("d1"))
    cm.buildSuggestIndex("c") // vocabulary is empty → empty artifact
    // min(max_edits) over the empty artifact is null — must fall through to
    // the on-the-fly path (itself empty here), not throw
    assert(cm.suggestTerms("c", Seq("zepelin")).count() === 0L)
  }

  test("facetCounts: per-facet top values by (count desc, value asc)") {
    val hits = Seq(("en", "a"), ("en", "b"), ("de", "a"), ("en", "a"), ("fr", "c"))
      .toDF("lang", "source")
    val out = Suggest.facetCounts(hits, Seq("lang", "source"), topK = 2)
      .orderBy("facet", "rank")
      .collect().map(r => (r.getString(0), r.getString(1), r.getLong(2), r.getLong(3)))
    assert(out.toSeq === Seq(
      ("lang", "en", 3L, 1L), ("lang", "de", 1L, 2L), // de beats fr on value asc
      ("source", "a", 3L, 1L), ("source", "b", 1L, 2L)))
  }
}
