package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.Pipeline
import graft.operators.Pipeline.CurationConfig

/** The config-driven curation pipeline end to end: each stage eliminates the
  * doc planted to trip it, survivors keep their audit-trail signals, and the
  * default config is a pass-through.
  */
class PipelineSpec extends AnyFunSuite with SparkSuite {

  private val boiler = "subscribe to our newsletter now"
  private def corpus = {
    import spark.implicits._
    Seq(
      // survivor: long, varied, clean
      (1L, "en", ("the quick brown fox jumps over the lazy dog near the river bank " * 3)
        + boiler),
      // near-dup of 1 (same text, higher id) → dropped by nearDedup
      (2L, "en", ("the quick brown fox jumps over the lazy dog near the river bank " * 3)
        + boiler),
      // too short → dropped by minTokens
      (3L, "en", "tiny"),
      // low entropy → dropped by entropyBand
      (4L, "en", "aaaa aaaa aaaa aaaa aaaa aaaa aaaa aaaa aaaa aaaa aaaa aaaa aaaa aaaa " +
        "aaaa aaaa aaaa aaaa aaaa aaaa aaaa aaaa aaaa aaaa aaaa aaaa aaaa aaaa aaaa aaaa"),
      // has PII → survives with redaction
      (5L, "en", ("contact me at someone@example.org about the quarterly planning " +
        "document we reviewed together last week with the team ") * 2 + boiler))
      .toDF("doc_id", "lang", "text")
  }

  test("null text flows through every stage without crashing") {
    import spark.implicits._
    val docs = Seq(
      (1L, "en", "a perfectly ordinary document with plenty of words to survive the quality gates in place"),
      (2L, "en", null.asInstanceOf[String]))
      .toDF("doc_id", "lang", "text")
    // every filtering stage on (incl. domain cap + LM gate): the null doc
    // must drop cleanly, never throw
    val lm = graft.operators.LanguageModel.train(
      docs.filter($"text".isNotNull), "doc_id", "text")
    val out = Pipeline.curate(docs, "doc_id", "text",
      CurationConfig(minTokens = 3, entropyBand = Some((1.0, 6.0)),
        redactPii = true, nearDedup = true, domainCap = Some(5)),
      lmModel = Some((lm, 50.0)))
    assert(out.select("doc_id").collect().map(_.getLong(0)).toSeq === Seq(1L))
    // and the per-op entry points tolerate null too
    assert(graft.operators.Curation.redactPii(docs, "text").count() === 2)
    assert(graft.operators.Curation.withDomains(docs, "text").count() === 2)
    assert(graft.operators.TextAnalysis.withCharEntropy(docs, "text").count() === 2)
  }

  test("default config is a pass-through") {
    val out = Pipeline.curate(corpus, "doc_id", "text")
    assert(out.count() === corpus.count())
    assert(out.columns.toSet === Set("doc_id", "lang", "text"))
  }

  test("each stage eliminates its planted doc; survivors carry signals") {
    // every doc contains `boiler` except 3/4; with maxOccurrences=2 the line
    // survives (3 occurrences would need 3+ docs sharing it) — keep it simple:
    val out = Pipeline.curate(corpus, "doc_id", "text",
      CurationConfig(
        lineDedupMaxOccurrences = Some(5), // structural stage on, nothing dropped
        minTokens = 10,
        entropyBand = Some((2.0, 6.0)),
        redactPii = true,
        nearDedup = true))
    val byId = out.collect().map(r => r.getAs[Long]("doc_id") -> r).toMap

    assert(byId.keySet === Set(1L, 5L)) // 2 near-dup, 3 short, 4 low-entropy
    // audit-trail columns present
    assert(out.columns.contains("n_tokens") && out.columns.contains("entropy"))
    // PII was scrubbed in place
    val t5 = byId(5L).getAs[String]("text")
    assert(t5.contains("<EMAIL>") && !t5.contains("example.org"))
    assert(byId(5L).getAs[Long]("n_emails") === 2L)
    // non-text columns survived the stages
    assert(byId(1L).getAs[String]("lang") === "en")
  }

  test("model-based quality stage drops low scorers, keeps the score column") {
    import spark.implicits._
    val good = "a thoughtful well written paragraph about distributed systems"
    val bad = "buy now click here buy now click here buy now"
    val e = new graft.functions.HashingEmbedder(64)
    val w = e.embed(good).zip(e.embed(bad)).map { case (g, b) => g - b }
    val model = graft.functions.LinearQualityModel.fromWeights(0.0, w)
    val docs = Seq((1L, good), (2L, bad)).toDF("doc_id", "text")
    val out = Pipeline.curate(docs, "doc_id", "text",
      qualityModel = Some((model, 0.5)))
    val rows = out.collect()
    assert(rows.map(_.getAs[Long]("doc_id")).toSeq === Seq(1L))
    assert(rows.head.getAs[Double]("model_quality") > 0.5)
  }

  test("curate composes inside a streaming foreachBatch merge") {
    import spark.implicits._
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val stream = org.apache.spark.sql.execution.streaming.runtime
      .MemoryStream[(Long, String)]
    val tmp = java.nio.file.Files.createTempDirectory("graft-stream-curate")
    val outDir = s"$tmp/out"
    val q = stream.toDF().toDF("doc_id", "text").writeStream
      .option("checkpointLocation", s"$tmp/ckpt")
      .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
      .foreachBatch { (batch: org.apache.spark.sql.DataFrame, _: Long) =>
        Pipeline.curate(batch, "doc_id", "text",
            Pipeline.CurationConfig(minTokens = 3, redactPii = true))
          .write.mode("append").parquet(outDir)
        ()
      }
    stream.addData(
      (1L, "a long enough document mentioning someone@example.com today"),
      (2L, "too short"))
    q.start().awaitTermination(60000)
    val rows = spark.read.parquet(outDir).collect()
    assert(rows.map(_.getAs[Long]("doc_id")).toSeq === Seq(1L))
    assert(rows.head.getAs[String]("text").contains("<EMAIL>"))
  }

  test("LM-perplexity gate drops unnatural text, passes null-evidence docs") {
    import spark.implicits._
    val natural = "the quick brown fox jumps over the lazy dog " * 4
    val train = (1L to 20L).map(i => (i, natural)).toDF("doc_id", "text")
    val model = graft.operators.LanguageModel.train(train, "doc_id", "text")
    val docs = Seq(
      (1L, natural),                             // in-distribution → avg_nll ≈ 0.17
      (2L, "zq xv qj vx zk wq jx kq zz vv xx"),  // all-OOV → smoothing floor ln|V+1|
      (3L, "solo"))                              // 1 token → null score, passes
      .toDF("doc_id", "text")
    val out = Pipeline.curate(docs, "doc_id", "text",
        lmModel = Some((model, 1.0)))
      .select("doc_id").as[Long].collect().toSet
    assert(out === Set(1L, 3L))
  }

  test("domain cap keeps the n largest docs per domain, un-URLed pass through") {
    import spark.implicits._
    val docs = Seq(
      (1L, "see https://spam.example.com/a " + ("filler words here " * 10)),
      (2L, "see https://spam.example.com/b " + ("filler words here " * 6)),
      (3L, "see https://spam.example.com/c " + ("filler words here " * 2)),
      (4L, "see https://other.example.net/x page content"),
      (5L, "no links at all in this perfectly fine document"))
      .toDF("doc_id", "text")
    val out = Pipeline.curate(docs, "doc_id", "text",
        CurationConfig(domainCap = Some(2)))
      .select("doc_id").as[Long].collect().toSet
    // spam domain capped to its 2 largest (1, 2); other domain + no-URL kept
    assert(out === Set(1L, 2L, 4L, 5L))
  }

  test("decontamination and sampling stages compose at the tail") {
    import spark.implicits._
    val bench = Seq((900L,
      "the quick brown fox jumps over the lazy dog near the river bank and beyond"))
      .toDF("bid", "btext")
    val out = Pipeline.curate(corpus, "doc_id", "text",
      CurationConfig(minTokens = 1),
      benchmark = Some((bench, "bid", "btext")))
    // docs 1 and 2 share a 13-gram with the benchmark → decontaminated away
    assert(out.select("doc_id").collect().map(_.getLong(0)).toSet === Set(3L, 4L, 5L))

    // the bloom path drops the same docs (no false positives at this scale)
    val outBloom = Pipeline.curate(corpus, "doc_id", "text",
      CurationConfig(minTokens = 1, decontaminateViaBloom = true),
      benchmark = Some((bench, "bid", "btext")))
    assert(outBloom.select("doc_id").collect().map(_.getLong(0)).toSet === Set(3L, 4L, 5L))

    // the ExactSubstr mode (collision-free spans, precedence over ngram
    // modes) drops exactly the docs sharing a verbatim 40-char window: docs
    // 1 and 2 contain the benchmark sentence; 3/4/5 share nothing that long
    val outSubstr = Pipeline.curate(corpus, "doc_id", "text",
      CurationConfig(minTokens = 1, decontaminateSubstrLen = Some(40)),
      benchmark = Some((bench, "bid", "btext")))
    assert(outSubstr.select("doc_id").collect().map(_.getLong(0)).toSet === Set(3L, 4L, 5L))

    // strip mode keeps all docs but removes the overlapping ranges: docs 1
    // and 2 shrink, everything else is byte-identical
    val outStrip = Pipeline.curate(corpus, "doc_id", "text",
      CurationConfig(minTokens = 1, decontaminateSubstrLen = Some(40),
        decontaminateSubstrStrip = true),
      benchmark = Some((bench, "bid", "btext")))
    val lens = outStrip.select("doc_id", "text").collect()
      .map(r => r.getLong(0) -> r.getString(1).length).toMap
    val origLens = corpus.select("doc_id", "text").collect()
      .map(r => r.getLong(0) -> r.getString(1).length).toMap
    assert(lens.keySet === Set(1L, 2L, 3L, 4L, 5L))
    assert(lens(1L) < origLens(1L) && lens(2L) < origLens(2L))
    assert(lens(3L) === origLens(3L) && lens(4L) === origLens(4L) && lens(5L) === origLens(5L))

    val sampled = Pipeline.curate(corpus, "doc_id", "text",
      CurationConfig(sampleRates = Some(Map("en" -> 1.0))),
      stratumCol = Some("lang"))
    assert(sampled.count() === 5) // rate 1.0 keeps all
    val none = Pipeline.curate(corpus, "doc_id", "text",
      CurationConfig(sampleRates = Some(Map("en" -> 0.0))),
      stratumCol = Some("lang"))
    assert(none.count() === 0)
  }

  test("within-corpus ExactSubstr self-dedup: drop mode, strip mode, floor re-apply") {
    def ids(df: org.apache.spark.sql.DataFrame): Set[Long] =
      df.select("doc_id").collect().map(_.getLong(0)).toSet

    // drop mode: docs 1 and 2 are verbatim copies → both contain shared
    // 40-char windows → BOTH drop (crossDocOnly ignores doc 5's internal ×2)
    val dropped = Pipeline.curate(corpus, "doc_id", "text",
      CurationConfig(selfDedupSubstrLen = Some(40)))
    assert(ids(dropped) === Set(3L, 4L, 5L))

    // strip mode without floors: everything survives, the shared ranges strip
    // out of EVERY copy — the identical docs 1/2 go (near-)empty, 3/4/5 are
    // byte-identical to their inputs
    val stripped = Pipeline.curate(corpus, "doc_id", "text",
      CurationConfig(selfDedupSubstrLen = Some(40), selfDedupSubstrStrip = true))
    val lens = stripped.select("doc_id", "text").collect()
      .map(r => r.getLong(0) -> r.getString(1).length).toMap
    val origLens = corpus.select("doc_id", "text").collect()
      .map(r => r.getLong(0) -> r.getString(1).length).toMap
    assert(lens.keySet === Set(1L, 2L, 3L, 4L, 5L))
    assert(lens(1L) < origLens(1L) && lens(2L) < origLens(2L))
    assert(lens(3L) === origLens(3L) && lens(4L) === origLens(4L) &&
      lens(5L) === origLens(5L))

    // strip mode WITH floors: the floors re-apply to the REBUILT text, so the
    // stripped-to-empty copies drop instead of shipping sub-threshold docs,
    // and the audit column reflects the post-strip text
    val gated = Pipeline.curate(corpus, "doc_id", "text",
      CurationConfig(minTokens = 5, selfDedupSubstrLen = Some(40),
        selfDedupSubstrStrip = true))
    assert(ids(gated) === Set(4L, 5L))
    val postTokens = gated.select("doc_id", "n_tokens").collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(postTokens.values.forall(_ >= 5L))
  }

  test("strip mode re-applies EVERY configured gate to the rebuilt text") {
    import spark.implicits._
    // docs 1 and 2 share a >=40-char high-entropy passage. After strip-mode
    // self-dedup removes it from both, doc 1's remainder is low-entropy
    // filler while doc 2's stays varied — so an entropy band that BOTH pass
    // pre-strip must drop doc 1 post-strip. Doc 3 shares nothing and is
    // untouched.
    val shared = "the quick brown fox jumps over the lazy dog beside a river"
    val docs = Seq(
      (1L, shared + " aaaa aaaa aaaa aaaa aaaa aaaa aaaa aaaa aaaa aaaa"),
      (2L, shared + " many varied tokens keep character entropy comfortably high here"),
      (3L, "an unrelated document with plenty of distinct words and characters in it"))
      .toDF("doc_id", "text")

    // sanity: pre-strip, all three are inside the band
    val pre = graft.operators.TextAnalysis.withCharEntropy(docs, "text")
      .select("doc_id", "entropy").collect()
      .map(r => r.getLong(0) -> r.getDouble(1)).toMap
    assert(pre.values.forall(e => e >= 2.5 && e <= 6.0))

    val out = Pipeline.curate(docs, "doc_id", "text",
      CurationConfig(entropyBand = Some((2.5, 6.0)),
        selfDedupSubstrLen = Some(40), selfDedupSubstrStrip = true))
    val survivors = out.select("doc_id", "entropy", "text").collect()
      .map(r => (r.getLong(0), r.getDouble(1), r.getString(2))).toList
    assert(survivors.map(_._1).toSet === Set(2L, 3L))
    // the audit column reflects the POST-strip text, not the pre-strip score
    survivors.foreach { case (id, ent, text) =>
      val fresh = graft.operators.TextAnalysis.withCharEntropy(
        Seq((id, text)).toDF("doc_id", "text"), "text")
        .select("entropy").head().getDouble(0)
      assert(math.abs(ent - fresh) < 1e-9)
    }

    // the model-score and LM gates re-apply through the same path: with a
    // permissive threshold survivors carry RECOMPUTED audit columns matching
    // a fresh scoring of their shipped text
    val lm = graft.operators.LanguageModel.train(docs, "doc_id", "text")
    val withLm = Pipeline.curate(docs, "doc_id", "text",
      CurationConfig(selfDedupSubstrLen = Some(40), selfDedupSubstrStrip = true),
      lmModel = Some((lm, 1e9)))
    val audit = withLm.select("doc_id", "text", "avg_nll").collect()
      .map(r => (r.getLong(0), r.getString(1),
        if (r.isNullAt(2)) None else Some(r.getDouble(2)))).toList
    assert(audit.map(_._1).toSet === Set(1L, 2L, 3L))
    audit.foreach { case (id, text, nll) =>
      val fresh = graft.operators.LanguageModel.scoreAgainst(
        Seq((id, text)).toDF("doc_id", "text"), "doc_id", "text", lm)
        .select("avg_nll").collect()
        .map(r => if (r.isNullAt(0)) None else Some(r.getDouble(0))).head
      assert(nll === fresh, s"doc $id audit avg_nll stale")
    }
  }
}
