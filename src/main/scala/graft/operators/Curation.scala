package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Training-corpus curation beyond dedup — the passes a large-scale
  * pretraining pipeline runs between raw ingest and tokenization
  * (C4/Dolma-style; the reference engine stops at search, so these are
  * LLM-pipeline extensions in the same spirit as the dedup family in
  * [[Dedup]]): PII redaction, benchmark decontamination, URL/domain
  * provenance, reproducible stratified mixture sampling, and token-budget
  * shard packing. [[Pipeline.curate]] composes them behind one config.
  *
  * Scale shapes:
  *  - redaction / domain extraction / sampling are pure per-row maps and
  *    predicates (codegen'd regex, md5-threshold compare) — zero shuffles;
  *  - decontamination explodes word n-grams on the corpus side but BROADCASTS
  *    the benchmark side (benchmarks are MBs, corpora are TBs), so the join
  *    adds no corpus shuffle; the only exchange is the per-doc count groupBy
  *    on (id, hash) pairs;
  *  - shard packing is a distributed prefix sum: per-bucket windows plus a
  *    metadata-sized broadcast offset table — no global window anywhere.
  */
object Curation {

  /** PII patterns, kept to the Java/RE2 common regex subset so the DuckDB
    * oracle replays them verbatim.
    */
  val emailPattern = "[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}"
  val ipv4Pattern = "\\b\\d{1,3}\\.\\d{1,3}\\.\\d{1,3}\\.\\d{1,3}\\b"
  val phonePattern = "\\+\\d{1,3} \\d{3} \\d{4}"

  /** Redact emails, IPv4 addresses, and international-format phone numbers to
    * typed placeholders, keeping per-doc counts (the audit trail a curation
    * run reports). Replacement order is fixed (email → ip → phone) so nested
    * matches resolve deterministically; counts are taken before redaction.
    */
  def redactPii(df: DataFrame, textCol: String): DataFrame =
    df
      .withColumn("n_emails",
        regexp_count(col(textCol), lit(emailPattern)).cast("long"))
      .withColumn("n_ips",
        regexp_count(col(textCol), lit(ipv4Pattern)).cast("long"))
      .withColumn("n_phones",
        regexp_count(col(textCol), lit(phonePattern)).cast("long"))
      .withColumn("redacted",
        regexp_replace(
          regexp_replace(
            regexp_replace(col(textCol), emailPattern, "<EMAIL>"),
            ipv4Pattern, "<IP>"),
          phonePattern, "<PHONE>"))

  /** Benchmark decontamination: flag every training document sharing at least
    * one word `n`-gram with the benchmark corpus (the standard 13-gram rule).
    * Output: one row per training doc — (idCol, n_contaminated_ngrams,
    * contaminated).
    *
    * Both sides shingle with [[Dedup.withShingles]] (docs shorter than n
    * tokens contribute their whole text as one shingle, so short benchmark
    * items still decontaminate). The corpus side joins on a 64-bit ngram hash
    * — a narrow column instead of a ~13-word string — against the broadcast,
    * deduped benchmark hash set.
    */
  def decontaminate(
      docs: DataFrame, benchmark: DataFrame,
      idCol: String, textCol: String,
      benchIdCol: String, benchTextCol: String,
      n: Int = 13,
      broadcastBench: Boolean = true): DataFrame = {
    val docNg = Dedup.withShingles(docs, idCol, textCol, n)
      .select(col(idCol), explode(col("sh")).as("ng"))
      .select(col(idCol), xxhash64(col("ng")).as("h"))
    val benchNg0 = Dedup.withShingles(benchmark, benchIdCol, benchTextCol, n)
      .select(explode(col("sh")).as("ng"))
      .select(xxhash64(col("ng")).as("h")).distinct()
    val benchNg = if (broadcastBench) broadcast(benchNg0) else benchNg0
    val hits = docNg.join(benchNg, "h")
      .groupBy(idCol).agg(countDistinct("h").as("n_contaminated_ngrams"))
    docs.select(col(idCol))
      .join(hits, Seq(idCol), "left")
      .select(col(idCol),
        coalesce(col("n_contaminated_ngrams"), lit(0L)).as("n_contaminated_ngrams"))
      .withColumn("contaminated", col("n_contaminated_ngrams") > 0)
  }

  /** URL pattern for [[withDomains]], in the Java/RE2 common subset. */
  val urlPattern = "https?://[A-Za-z0-9.-]+(?:/[^\\s]*)?"
  private val domainPattern = "https?://([A-Za-z0-9.-]+)"

  /** Extract URLs and their distinct domains per document — the input to
    * domain-level corpus curation (blocklist filtering, per-domain caps,
    * provenance stats). Pure per-row map: `urls` (all matches, in order) and
    * `domains` (distinct, first-occurrence order).
    */
  def withDomains(df: DataFrame, textCol: String): DataFrame =
    df
      .withColumn("urls", regexp_extract_all(col(textCol), lit(urlPattern), lit(0)))
      .withColumn("domains", array_distinct(
        transform(col("urls"), u => regexp_extract(u, domainPattern, 1))))

  /** First 6 hex chars of (2^24 × rate), the keep-threshold for
    * [[stratifiedSample]]'s lexicographic compare. Rates ≥ 1 keep everything
    * (handled by keepFor's lit(true)); for rates just below 1 the rounded
    * value is clamped to 2^24−1 = "ffffff" — 1<<24 would format as the
    * 7-char "1000000", whose lexicographic compare against 6-char hashes
    * silently keeps only ~6% of rows.
    */
  def rateThresholdHex(rate: Double): String =
    f"${math.max(0L, math.min((1 << 24) - 1, math.round(rate * (1 << 24))))}%06x"

  /** Reproducible stratified sampling for training mixtures: keep a row iff
    * the first 6 hex chars of md5(salt ++ id) compare below the stratum's
    * rate threshold. A pure per-row predicate — no RNG state, no shuffle, no
    * ordering sensitivity — so the same (id, salt) draws the same decision at
    * any parallelism or scale, reruns are exact, and DuckDB replays it
    * bit-for-bit (lowercase-hex lexicographic order IS numeric order).
    * Changing `salt` redraws the sample without touching the rates.
    */
  def stratifiedSample(
      df: DataFrame, idCol: String, stratumCol: String,
      rates: Map[String, Double], defaultRate: Double = 0.0,
      salt: String = ""): DataFrame = {
    val h = substring(md5(concat(lit(salt), col(idCol).cast("string"))), 1, 6)
    def keepFor(rate: Double) =
      if (rate >= 1.0) lit(true) else h < lit(rateThresholdHex(rate))
    val keep = rates.foldLeft(when(lit(false), lit(false))) {
      case (acc, (stratum, rate)) => acc.when(col(stratumCol) === stratum, keepFor(rate))
    }.otherwise(keepFor(defaultRate))
    df.filter(keep)
  }

  /** Pack ordered rows into fixed token-budget training shards: virtually
    * concatenate documents in (bucketCol, orderCol) order and cut every
    * `budget` tokens — shard = floor(tokens-before / budget), the standard
    * pretraining shard rule.
    *
    * Scale shape — a distributed prefix sum, NOT one global window: the
    * running sum partitions by `bucketCol` (a coarse ordered grouping the
    * caller already has: ingest date, source file, id range), and bucket
    * start-offsets come from a #buckets-row aggregate whose own window is
    * metadata-sized. The only corpus-wide exchanges are the per-bucket
    * aggregate and the bucket window partitioning; nothing ever funnels the
    * corpus through one task. `orderCol` must be unique within a bucket for
    * a deterministic cut.
    */
  def packByTokenBudget(
      df: DataFrame, bucketCol: String, orderCol: String,
      tokensCol: String, budget: Long): DataFrame = {
    require(budget > 0, "budget must be positive")
    withGlobalOffset(df, bucketCol, orderCol, tokensCol)
      .withColumn("shard_id", floor(col("_before") / budget))
      .drop("_before")
  }

  /** Global token offset of each row in (bucket, order) concatenation order —
    * the distributed prefix sum shared by [[packByTokenBudget]] and
    * [[packSequences]]: per-bucket windows do the heavy lifting in parallel,
    * and only the |buckets|-row offset table runs through an unpartitioned
    * window before broadcasting back. Adds `_before`.
    */
  private def withGlobalOffset(df: DataFrame, bucketCol: String,
                               orderCol: String, tokensCol: String): DataFrame = {
    val totals = df.groupBy(col(bucketCol).as("_b"))
      .agg(sum(col(tokensCol)).as("_bt"))
    val wBuckets = org.apache.spark.sql.expressions.Window
      .orderBy("_b").rowsBetween(Long.MinValue, -1)
    val offsets = totals
      .withColumn("_off", coalesce(sum("_bt").over(wBuckets), lit(0L)))
      .drop("_bt")
    val wInBucket = org.apache.spark.sql.expressions.Window
      .partitionBy(col(bucketCol)).orderBy(col(orderCol))
      .rowsBetween(Long.MinValue, -1)
    df.join(broadcast(offsets), col(bucketCol) === col("_b")).drop("_b")
      .withColumn("_before",
        col("_off") + coalesce(sum(col(tokensCol)).over(wInBucket), lit(0L)))
      .drop("_off")
  }

  /** Fixed-length sequence packing — the LLM-pretraining pack: concatenate
    * the (bucket, order)-ordered token stream and cut every `seqLen` tokens.
    * Each doc reports its global token offset and the sequence range it lands
    * in; a doc crossing a cut spans into the next sequence (standard packed
    * pretraining — a loader that truncates instead drops the tail rows).
    * Zero-token docs pin to their offset's sequence with n_seqs = 0. Same
    * exchanges as [[packByTokenBudget]]; the cut positions are pure math on
    * the offset, so the whole layout is metadata — no token materializes.
    */
  def packSequences(df: DataFrame, bucketCol: String, orderCol: String,
                    tokensCol: String, seqLen: Long): DataFrame = {
    require(seqLen > 0, "seqLen must be positive")
    withGlobalOffset(df, bucketCol, orderCol, tokensCol)
      .withColumn("global_offset", col("_before"))
      .withColumn("seq_start", floor(col("global_offset") / seqLen))
      .withColumn("seq_end",
        when(col(tokensCol) > 0,
          floor((col("global_offset") + col(tokensCol) - 1) / seqLen))
          .otherwise(floor(col("global_offset") / seqLen)))
      .withColumn("n_seqs",
        when(col(tokensCol) > 0, col("seq_end") - col("seq_start") + 1)
          .otherwise(lit(0L)))
      .drop("_before")
  }

  /** Deterministic per-epoch training-order shuffle: every epoch re-deals the
    * corpus into `nShards` shards and a fresh within-shard order, both pure
    * functions of (id, epoch) — so a restarted run, a re-run on different
    * parallelism, or a different executor count deals the IDENTICAL order
    * (the property RNG-based shuffles lose the moment partitioning changes).
    * Loaders stream shards in shard_id order, rows in shard_pos order; across
    * epochs each doc lands in a different shard at a different position — the
    * standard "global shuffle per epoch" pretraining contract without
    * materializing a permuted copy of the corpus.
    *
    * Scale shape: the shard assignment is a per-row hash (no exchange); the
    * within-shard position is a window partitioned BY SHARD — corpus/nShards
    * rows per window task, never one global sort. Pick nShards ≳ executor
    * count; at 100 TB a few thousand shards keeps each window task in memory.
    *
    * Output: input columns + (shard_id, shard_pos).
    */
  def epochShuffle(df: DataFrame, idCol: String, epoch: Int, nShards: Int): DataFrame = {
    require(nShards > 0, "nShards must be positive")
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy("shard_id").orderBy(col("_h"), col(idCol))
    df.withColumn("_h", hash32(col(idCol), s"epoch$epoch:"))
      .withColumn("shard_id", col("_h") % nShards)
      .withColumn("shard_pos", (row_number().over(w) - 1).cast("long"))
      .drop("_h")
  }

  /** First 8 md5 hex chars of (salt ++ id), parsed as an exact BIGINT in
    * [0, 2^32) — the per-row uniform draw behind [[weightedSample]]. Integer
    * math end to end, so Spark (`conv`) and the oracle ([[hash32DigitSumSql]],
    * DuckDB has no hex-parse) agree bit for bit.
    */
  def hash32(id: Column, salt: String): Column =
    conv(substring(md5(concat(lit(salt), id.cast("string"))), 1, 8), 16, 10)
      .cast("long")

  /** DuckDB replica of [[hash32]]: positional digit-sum over a column already
    * holding the 8-char hex prefix (compute the md5 once in a prior CTE).
    */
  def hash32DigitSumSql(hexCol: String): String =
    (1 to 8).map { i =>
      s"(strpos('0123456789abcdef', substring($hexCol, $i, 1)) - 1) * ${1L << (4 * (8 - i))}"
    }.mkString(" + ")

  /** Reproducible weighted sampling without replacement (Efraimidis &
    * Spirakis, "Weighted random sampling with a reservoir", IPL 2006): rank
    * rows by u^(1/w) for a uniform u and keep the top n per stratum. Ranking
    * by ln(u)/w is the same order (monotone transform) with less libm, and u
    * comes from [[hash32]] — a pure per-row draw, so the sample is identical
    * at any parallelism and reruns are exact, like [[stratifiedSample]].
    * Ranks compare the key ROUNDED to 9 decimals with an id tie-break so a
    * last-ulp ln() divergence between engines cannot reorder rows.
    *
    * Rows with non-positive weight are dropped. Adds `es_key` (the rounded
    * ranking key). One exchange: the per-stratum ranking window.
    */
  def weightedSample(
      df: DataFrame, idCol: String, stratumCol: String, weightCol: String,
      n: Int, salt: String = ""): DataFrame = {
    require(n > 0, "n must be positive")
    val u = (hash32(col(idCol), salt) + lit(0.5)) / lit(4294967296.0)
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col(stratumCol))
      .orderBy(col("es_key").desc, col(idCol).asc)
    df.filter(col(weightCol) > 0)
      .withColumn("es_key", round(log(u) / col(weightCol).cast("double"), 9))
      .withColumn("_rn", row_number().over(w))
      .where(col("_rn") <= n)
      .drop("_rn")
  }

  /** Training-mixture rate planner: given target corpus shares per stratum
    * and a total token budget, compute the per-stratum keep rate
    * min(1, budget·share / stratum_tokens) that [[stratifiedSample]] then
    * executes. One metadata-sized aggregate (|strata| rows) — the planning
    * half of mixture construction, kept separate from the sampling half so
    * rates are inspectable (and cappable) before any data moves.
    * Output per stratum: n_docs, n_tokens, target_share, rate.
    */
  def mixturePlan(df: DataFrame, stratumCol: String, tokensCol: String,
                  targetShares: Map[String, Double], budget: Long): DataFrame = {
    require(budget > 0, "budget must be positive")
    val share = targetShares.toSeq.sortBy(_._1)
      .foldLeft(when(lit(false), lit(0.0))) { case (acc, (k, v)) =>
        acc.when(col(stratumCol) === k, lit(v))
      }.otherwise(lit(0.0))
    df.groupBy(col(stratumCol))
      .agg(count(lit(1)).as("n_docs"), sum(col(tokensCol)).as("n_tokens"))
      .withColumn("target_share", share)
      .withColumn("rate", round(
        least(lit(1.0), lit(budget.toDouble) * col("target_share") /
          greatest(col("n_tokens").cast("double"), lit(1.0))), 6))
  }

  /** Cap rows per key (the per-domain document cap of C4/RefinedWeb-style
    * curation): keep the top `n` rows of each `keyCol` group by
    * (orderCol desc, idCol asc). One exchange: the per-key ranking window —
    * bounded by the largest group, the same discipline as any keyed window.
    */
  def capPerKey(df: DataFrame, keyCol: String, idCol: String,
                orderCol: String, n: Int): DataFrame = {
    require(n > 0, "n must be positive")
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col(keyCol))
      .orderBy(col(orderCol).desc, col(idCol).asc)
    df.withColumn("_rn", row_number().over(w))
      .where(col("_rn") <= n)
      .drop("_rn")
  }
}
