package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Training-corpus curation beyond dedup: PII redaction and benchmark
  * decontamination — the two scrub passes every large-scale pretraining
  * pipeline runs between raw ingest and tokenization (C4/Dolma-style; the
  * reference engine stops at search, so these are LLM-pipeline extensions in
  * the same spirit as the dedup family in [[Dedup]]).
  *
  * Scale shapes:
  *  - redaction is a pure per-row map (regexp_replace / regexp_count are
  *    codegen'd) — zero shuffles, scales linearly with the scan;
  *  - decontamination explodes word n-grams on the corpus side but BROADCASTS
  *    the benchmark side (benchmarks are MBs, corpora are TBs), so the join
  *    adds no corpus shuffle; the only exchange is the per-doc count groupBy
  *    on (id, hash) pairs.
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
}
