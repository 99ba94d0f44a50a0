package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Deduplication operators for large-scale training-data pipelines.
  *
  * The reference engine has only per-document identity (id-keyed replace on update —
  * /root/reference/main/core/documents_collection_creator.py:125-136); content-level
  * dedup is an extension this engine adds as first-class operators:
  *
  *  - exact:      md5-hash groupBy — one shuffle on a 32-byte key.
  *  - MinHash+LSH: shingle → 4-slice md5 minhash signature → band buckets →
  *                 candidate pairs only within buckets (no all-pairs join at scale).
  *  - SimHash:    16-bit fingerprint from per-token md5 nibbles; near-dups share
  *                fingerprints (or differ by few bits).
  *  - n-gram Jaccard: exact verify on LSH candidates (or a bounded subset).
  *  - embedding near-dup: sign-LSH buckets over the embedding, cosine within bucket.
  *
  * All hash math is md5-hex based so every operator is byte-reproducible in ANSI SQL
  * (DuckDB oracle parity): minhash = lexicographic MIN over 8-hex-char md5 slices —
  * a uniform 32-bit hash family, portable because md5 and substring agree everywhere.
  *
  * Scale: every operator is a scan + narrow per-row transforms + one shuffle on a
  * small key (hash / band / bucket). No operator materializes all-pairs; candidate
  * generation is bucket-local, so pair count is Σ_buckets |bucket|² — controlled by
  * band width, not corpus size. Skewed buckets (e.g. empty-text docs) are the one
  * hazard; cap bucket size upstream if inputs can degenerate.
  */
object Dedup {

  /** SQL fragment: tokens of a text column (same tokenizer as Search). */
  private def toksExpr(textCol: String): String =
    s"filter(split(lower($textCol), '[^a-z0-9]+'), t -> t != '')"

  /** SQL fragment: word n-gram shingles; docs shorter than n tokens fall back to a
    * single whole-text shingle so every doc gets a signature.
    */
  def shinglesExpr(textCol: String, n: Int = 3): String = {
    val t = toksExpr(textCol)
    s"""CASE WHEN size($t) < $n THEN array(array_join($t, ' '))
       |ELSE transform(sequence(1, size($t) - ${n - 1}), i -> array_join(slice($t, i, $n), ' ')) END""".stripMargin
  }

  def shinglesCol(textCol: String, n: Int = 3): Column = expr(shinglesExpr(textCol, n))

  /** Minhash value h (0-based) = lexicographic MIN over shingles of the h-th
    * disjoint 8-hex-char slice of md5(shingle) — 4 hash functions per md5. Takes a
    * pre-computed md5-per-shingle array column so md5 runs once, not 4×.
    */
  def minhashCol(shingleMd5s: Column, h: Int): Column =
    array_min(transform(shingleMd5s, m => substring(m, 8 * h + 1, 8)))

  /** Per-document minhash signatures plus LSH band-bucket sizes (2 bands × 2 rows).
    * A doc is a near-dup candidate iff it shares a band bucket with another doc.
    * Output: id, sig0..sig3, band0, band1, b0_size, b1_size, is_candidate.
    */
  def minhashLsh(docs: DataFrame, idCol: String, textCol: String, shingleN: Int = 3): DataFrame = {
    docs
      .select(col(idCol), transform(shinglesCol(textCol, shingleN), s => md5(s)).as("_m"))
      .select(
        (col(idCol) +: (0 until 4).map(h => minhashCol(col("_m"), h).as(s"sig$h"))): _*)
      .withColumn("band0", concat(col("sig0"), col("sig1")))
      .withColumn("band1", concat(col("sig2"), col("sig3")))
      .withColumn("b0_size", count(lit(1)).over(Window.partitionBy("band0")))
      .withColumn("b1_size", count(lit(1)).over(Window.partitionBy("band1")))
      .withColumn("is_candidate", (col("b0_size") > 1 || col("b1_size") > 1).cast("int"))
  }

  /** Candidate pairs from an LSH band bucket, verified with exact shingle-set
    * Jaccard. The self-join is keyed on the band value — bucket-local, no all-pairs.
    */
  def minhashCandidatePairs(
      docs: DataFrame, idCol: String, textCol: String, minJaccard: Double,
      shingleN: Int = 3): DataFrame = {
    val sh = docs
      .select(col(idCol), shinglesCol(textCol, shingleN).as("_sh"))
      .select(col(idCol), transform(col("_sh"), s => md5(s)).as("_m"),
        array_distinct(col("_sh")).as("sh"))
      .select(col(idCol),
        concat(minhashCol(col("_m"), 0), minhashCol(col("_m"), 1)).as("band0"),
        col("sh"))
    val a = sh.select(col(idCol).as("id_a"), col("band0"), col("sh").as("sh_a"))
    val b = sh.select(col(idCol).as("id_b"), col("band0"), col("sh").as("sh_b"))
    a.join(b, Seq("band0")).filter(col("id_a") < col("id_b"))
      .withColumn("inter", size(array_intersect(col("sh_a"), col("sh_b"))))
      .withColumn("jaccard",
        col("inter") / (size(col("sh_a")) + size(col("sh_b")) - col("inter")))
      .filter(col("jaccard") >= minJaccard)
      .select(col("id_a"), col("id_b"), round(col("jaccard"), 6).as("jaccard"))
  }

  /** Exact pairwise word-n-gram Jaccard (the verify path; at scale candidates come
    * from [[minhashCandidatePairs]] instead of a cross join — callers bound the
    * input to a subset or an LSH bucket before calling this).
    */
  def ngramJaccardPairs(
      docs: DataFrame, idCol: String, textCol: String, n: Int = 3): DataFrame = {
    val withSh = docs.select(col(idCol), array_distinct(shinglesCol(textCol, n)).as("sh"))
    val a = withSh.select(col(idCol).as("id_a"), col("sh").as("sh_a"))
    val b = withSh.select(col(idCol).as("id_b"), col("sh").as("sh_b"))
    a.crossJoin(b).filter(col("id_a") < col("id_b"))
      .withColumn("inter", size(array_intersect(col("sh_a"), col("sh_b"))))
      .withColumn("jaccard",
        col("inter") / (size(col("sh_a")) + size(col("sh_b")) - col("inter")))
      .select(col("id_a"), col("id_b"), round(col("jaccard"), 6).as("jaccard"))
  }

  /** 16-bit SimHash: bit j of the fingerprint is the sign of
    * Σ_tokens (high-bit of md5(token)'s j-th hex nibble ? +1 : −1).
    * One md5 per token (cached in an array column); 16 bit-sums fold over it.
    */
  def simhash16(textCol: String): Column = {
    val md5s = s"transform(${toksExpr(textCol)}, t -> md5(t))"
    expr(
      s"""aggregate(sequence(1, 16), 0L, (acc, j) -> acc + IF(
         |  aggregate($md5s, 0, (s, m) ->
         |    s + IF(instr('0123456789abcdef', substring(m, j, 1)) >= 9, 1, -1)) > 0,
         |  shiftleft(1L, j - 1), 0L))""".stripMargin)
  }

  /** Sign-LSH bucket key for an embedding: the sign pattern of the first `bits`
    * dimensions. Near-identical vectors collide; the near-dup self-join is
    * bucket-local (2^bits buckets bound pair counts).
    */
  def signBucket(vecCol: Column, bits: Int = 8): Column =
    array_join(transform(slice(vecCol, 1, bits),
      x => when(x >= 0f, lit("1")).otherwise(lit("0"))), "")

  /** Embedding-cosine near-dup candidate pairs: sign-LSH bucket, cosine within
    * bucket, keep pairs with cosine >= minCosine.
    */
  def embeddingNearDupPairs(
      emb: DataFrame, idCol: String, vecCol: String,
      minCosine: Double, bits: Int = 8): DataFrame = {
    import graft.plans.VectorFunctions.cosineF
    val withB = emb.select(col(idCol), col(vecCol), signBucket(col(vecCol), bits).as("bucket"))
    val a = withB.select(col(idCol).as("id_a"), col("bucket"), col(vecCol).as("v_a"))
    val b = withB.select(col(idCol).as("id_b"), col("bucket"), col(vecCol).as("v_b"))
    a.join(b, Seq("bucket")).filter(col("id_a") < col("id_b"))
      .withColumn("cos", cosineF(col("v_a"), col("v_b")))
      .filter(col("cos") >= minCosine)
      .select(col("id_a"), col("id_b"), round(col("cos"), 6).as("cos"))
  }
}
