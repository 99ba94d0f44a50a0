package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Config-driven curation pipeline: the end-to-end pass a training-data run
  * executes between raw ingest and tokenization, composing the individually
  * oracle-gated operators into ONE declarative plan (Catalyst sees the whole
  * DAG — filters merge, projections prune, nothing materializes between
  * stages). Stage order is the standard one: structural cleanup → quality
  * gates → privacy scrub → near-dup removal → decontamination → mixture
  * sampling. Every stage is optional; `CurationConfig()` is pass-through.
  *
  * Scale: stages add only the shuffles their underlying operators need
  * (lineDedup: line-keyed exchange; near-dup: one fingerprint window;
  * decontamination: broadcast benchmark join) — disabled stages cost nothing.
  */
object Pipeline {

  /** @param lineDedupMaxOccurrences drop lines appearing more than this many
    *   times corpus-wide (None = skip structural cleanup)
    * @param minTokens,minQuality gates on [[TextAnalysis.qualitySignals]]
    * @param entropyBand keep docs whose char entropy lies in [lo, hi]
    * @param redactPii replace emails/IPs/phones with typed placeholders
    * @param nearDedup keep only the smallest id per 16-bit SimHash bucket
    * @param domainCap keep only the n largest docs per first-URL domain
    *   (docs without a URL pass through uncapped)
    * @param sampleRates per-stratum keep rates (requires `stratumCol` at
    *   [[curate]]); None = keep everything
    */
  final case class CurationConfig(
      lineDedupMaxOccurrences: Option[Int] = None,
      minTokens: Long = 0L,
      minQuality: Double = 0.0,
      entropyBand: Option[(Double, Double)] = None,
      redactPii: Boolean = false,
      nearDedup: Boolean = false,
      domainCap: Option[Int] = None,
      sampleRates: Option[Map[String, Double]] = None,
      sampleDefaultRate: Double = 0.0,
      decontaminateNgram: Int = 13,
      // probe a fixed bitset instead of joining the benchmark ngram table —
      // the 100 TB path ([[Sketches.bloomDecontaminate]]); flags are a
      // superset (false positives drop a few extra docs, never miss one)
      decontaminateViaBloom: Boolean = false,
      bloomM: Int = 1 << 20,
      // collision-free ExactSubstr mode ([[SuffixArray.contaminatedSpans]]):
      // drop any doc sharing a verbatim window of this length with the
      // benchmark. Takes precedence over the ngram modes when set.
      decontaminateSubstrLen: Option[Int] = None,
      // with decontaminateSubstrLen: STRIP the contaminated character ranges
      // from the text ([[SuffixArray.stripSpans]]) instead of dropping docs
      decontaminateSubstrStrip: Boolean = false,
      // within-corpus ExactSubstr self-dedup (arXiv:2107.06499's primary use
      // case, [[SuffixArray.duplicateSpans]] with crossDocOnly): windows of
      // this length shared verbatim by >= 2 distinct docs are duplicated text
      selfDedupSubstrLen: Option[Int] = None,
      // with selfDedupSubstrLen: STRIP the duplicated ranges from every copy
      // instead of dropping the docs that contain them
      selfDedupSubstrStrip: Boolean = false)

  /** Run the configured stages over `docs`. Output keeps every input column,
    * with `textCol` rewritten in place by cleanup/redaction stages, plus the
    * signal columns the enabled stages computed (n_tokens, quality_score,
    * entropy, …) — the audit trail of why each surviving doc survived.
    *
    * @param benchmark optional (df, idCol, textCol) to decontaminate against
    * @param stratumCol column holding the sampling stratum (required when
    *   `cfg.sampleRates` is set)
    */
  /** @param qualityModel optional (model, minScore): fasttext-style linear
    *   scorer applied after the heuristic gates — docs below minScore drop,
    *   survivors keep their `model_quality` score
    * @param lmModel optional (bigram model, maxAvgNll): CCNet-style LM gate —
    *   docs whose mean −ln p(w2|w1) under the model exceeds the cap drop;
    *   docs with no evidence (< 2 tokens → null score) pass through, since
    *   null is "unmeasured", not "unnatural". Survivors keep `avg_nll`/`ppl`.
    */
  def curate(
      docs: DataFrame, idCol: String, textCol: String,
      cfg: CurationConfig = CurationConfig(),
      benchmark: Option[(DataFrame, String, String)] = None,
      stratumCol: Option[String] = None,
      qualityModel: Option[(graft.functions.LinearQualityModel, Double)] = None,
      lmModel: Option[(LanguageModel.BigramModel, Double)] = None): DataFrame = {

    val otherCols = docs.columns.filter(c => c != idCol && c != textCol)

    // 1. structural cleanup: C4-style boilerplate line removal
    var cur = cfg.lineDedupMaxOccurrences match {
      case Some(m) =>
        val cleaned = Dedup.lineDedup(docs.select(col(idCol), col(textCol)),
            idCol, textCol, maxOccurrences = m)
          .select(col(idCol), col("cleaned").as(textCol))
        if (otherCols.isEmpty) cleaned
        else cleaned.join(docs.drop(textCol), Seq(idCol))
      case None => docs
    }

    // 2. quality gates (signals computed once, reused by the filter)
    if (cfg.minTokens > 0 || cfg.minQuality > 0) {
      cur = TextAnalysis.qualitySignals(cur, textCol)
        .filter(col("n_tokens") >= cfg.minTokens &&
          col("quality_score") >= cfg.minQuality)
    }
    cfg.entropyBand.foreach { case (lo, hi) =>
      cur = TextAnalysis.withCharEntropy(cur, textCol)
        .filter(col("entropy").between(lo, hi))
    }

    // 2b. model-based quality gate (after the cheap heuristics so the model
    // scores only their survivors)
    qualityModel.foreach { case (model, minScore) =>
      cur = model.filterByQuality(cur, textCol, minScore)
    }

    // 2c. LM-perplexity gate (model tables broadcast; one bigram-key join)
    lmModel.foreach { case (model, maxAvgNll) =>
      val scores = LanguageModel.scoreAgainst(
        cur.select(col(idCol), col(textCol)), idCol, textCol, model)
      cur = cur.join(scores.drop("n_bigrams"), Seq(idCol))
        .filter(col("avg_nll").isNull || col("avg_nll") <= maxAvgNll)
    }

    // 3. privacy scrub (text rewritten in place; counts kept as audit trail)
    if (cfg.redactPii) {
      cur = Curation.redactPii(cur, textCol)
        .drop(textCol).withColumnRenamed("redacted", textCol)
    }

    // 4. near-dup removal: first doc id per fingerprint wins
    if (cfg.nearDedup) {
      cur = cur.withColumn("_fp", Dedup.simhash16(textCol))
        .withColumn("_keep",
          col(idCol) === min(idCol).over(Window.partitionBy("_fp")))
        .filter(col("_keep")).drop("_fp", "_keep")
    }

    // Strip-mode stages rewrite the text AFTER the quality gates ran, so a
    // stripped doc can fall below the configured floors (even to empty text).
    // Recompute EVERY configured gate's signals on the REBUILT text and
    // re-apply the same thresholds — heuristic floors, entropy band, model
    // score, and LM perplexity alike — so the audit columns and the gates
    // all reflect the text that actually ships.
    def reapplyFloors(df: DataFrame): DataFrame = {
      var out = df
      if (cfg.minTokens > 0 || cfg.minQuality > 0)
        out = TextAnalysis.qualitySignals(
            out.drop("n_tokens", "n_chars_t", "mean_word_len",
              "alnum_ratio", "stopword_ratio", "quality_score"),
            textCol)
          .filter(col("n_tokens") >= cfg.minTokens &&
            col("quality_score") >= cfg.minQuality)
      cfg.entropyBand.foreach { case (lo, hi) =>
        out = TextAnalysis.withCharEntropy(out.drop("entropy"), textCol)
          .filter(col("entropy").between(lo, hi))
      }
      qualityModel.foreach { case (model, minScore) =>
        out = model.filterByQuality(out.drop("model_quality"), textCol, minScore)
      }
      lmModel.foreach { case (model, maxAvgNll) =>
        val scores = LanguageModel.scoreAgainst(
          out.select(col(idCol), col(textCol)), idCol, textCol, model)
        out = out.drop("avg_nll", "ppl")
          .join(scores.drop("n_bigrams"), Seq(idCol))
          .filter(col("avg_nll").isNull || col("avg_nll") <= maxAvgNll)
      }
      out
    }

    // 4b. within-corpus ExactSubstr self-dedup: verbatim windows shared by
    // >= 2 distinct docs either strip out of EVERY copy (the collision-free
    // span semantics the dedup_strip_spans oracle gates) or drop the docs
    // containing them
    cfg.selfDedupSubstrLen.foreach { minLen =>
      val spans = SuffixArray.duplicateSpans(
        cur.select(col(idCol), col(textCol)), idCol, textCol, minLen,
        crossDocOnly = true)
      cur =
        if (cfg.selfDedupSubstrStrip)
          reapplyFloors(SuffixArray.stripSpans(cur, spans, idCol, textCol))
        else
          cur.join(spans.select(col(idCol)).distinct(), Seq(idCol), "left_anti")
    }

    // 4c. per-domain cap: largest docs win per first-URL-domain; docs with
    // no URL carry no site identity and pass through uncapped
    cfg.domainCap.foreach { n =>
      val withDom = Curation.withDomains(cur, textCol)
        .withColumn("_dom", try_element_at(col("domains"), lit(1))) // ANSI-safe on []
        .drop("urls", "domains")
      val capped = Curation.capPerKey(
        withDom.filter(col("_dom").isNotNull)
          .withColumn("_sz", length(col(textCol)).cast("long")),
        "_dom", idCol, "_sz", n).drop("_sz")
      cur = capped.unionByName(withDom.filter(col("_dom").isNull)).drop("_dom")
    }

    // 5. benchmark decontamination (drop contaminated): exact broadcast ngram
    // set by default, O(1)-per-ngram bloom probe when configured, or the
    // collision-free ExactSubstr span check (substrLen precedence)
    benchmark.foreach { case (bench, bid, btext) =>
      cfg.decontaminateSubstrLen match {
        case Some(minLen) =>
          val spans = SuffixArray.contaminatedSpans(
            cur.select(col(idCol), col(textCol)),
            bench.select(col(bid).as(idCol), col(btext).as(textCol)),
            idCol, textCol, minLen)
          cur =
            if (cfg.decontaminateSubstrStrip)
              reapplyFloors(SuffixArray.stripSpans(cur, spans, idCol, textCol))
            else
              cur.join(spans.select(col(idCol)).distinct(), Seq(idCol), "left_anti")
        case None =>
      val clean =
        if (cfg.decontaminateViaBloom)
          Sketches.bloomDecontaminate(cur, bench, idCol, textCol,
              bid, btext, n = cfg.decontaminateNgram, m = cfg.bloomM)
            .filter(!col("flagged"))
        else
          Curation.decontaminate(cur, bench, idCol, textCol,
              bid, btext, n = cfg.decontaminateNgram)
            .filter(!col("contaminated"))
      cur = cur.join(clean.select(col(idCol)), Seq(idCol), "left_semi")
      }
    }

    // 6. reproducible mixture sampling
    cfg.sampleRates.foreach { rates =>
      val stratum = stratumCol.getOrElse(throw new IllegalArgumentException(
        "sampleRates requires stratumCol"))
      cur = Curation.stratifiedSample(cur, idCol, stratum, rates,
        defaultRate = cfg.sampleDefaultRate)
    }
    cur
  }
}
