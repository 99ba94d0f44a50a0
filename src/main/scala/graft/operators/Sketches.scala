package graft.operators

import org.apache.spark.sql.{Column, DataFrame, Encoder, SparkSession}
import org.apache.spark.sql.catalyst.encoders.ExpressionEncoder
import org.apache.spark.sql.expressions.Aggregator
import org.apache.spark.sql.functions._

/** Fixed-size probabilistic summaries — the structures that replace
  * corpus-sized state with kilobyte-sized state at 100 TB.
  *
  * Everything here is DETERMINISTIC and built on the md5 primitive shared with
  * the DuckDB oracle (see [[Curation.hash32]]), so the driver's hash gate can
  * replicate the sketches bit for bit — including Bloom false positives. The
  * production swap-ins (Spark's `DataFrameStatFunctions.bloomFilter`,
  * `approx_count_distinct`) use engine-private hashing and are noted per
  * method; the semantics and the scale posture are identical.
  */
object Sketches {

  // ------------------------------------------------------------------- bloom

  /** Number of hash functions: the 32-char md5 hex splits into exactly four
    * disjoint 32-bit words, so k = 4 costs one digest per element.
    */
  val bloomK = 4

  /** The j-th (0-based) 32-bit word of an md5 hex string as a non-negative
    * long, reduced mod `m` — one Bloom bit position per word.
    */
  def bloomBit(hexMd5: Column, j: Int, m: Int): Column =
    conv(substring(hexMd5, 1 + 8 * j, 8), 16, 10).cast("long") % m

  /** All four bit positions for one element (given its md5 hex). */
  def bloomBits(hexMd5: Column, m: Int): Column =
    array((0 until bloomK).map(bloomBit(hexMd5, _, m)): _*)

  /** Build the bitset from the SMALL side (a benchmark / blocklist — the side
    * that is metadata-sized by definition). The distinct bit positions are
    * collected to the driver (≤ 4×|elements|, each a long) and packed into a
    * long-word bitset of m/64 words — 128 KiB at the default m = 2^20, a
    * broadcast-sized object regardless of corpus size.
    */
  def buildBloom(elements: DataFrame, elemMd5: Column, m: Int): Array[Long] = {
    require(m % 64 == 0, "m must be a multiple of 64")
    val words = new Array[Long](m / 64)
    elements.select(explode(bloomBits(elemMd5, m)).as("b")).distinct()
      .collect().foreach { r =>
        val b = r.getLong(0)
        words((b >> 6).toInt) |= (1L << (b & 63))
      }
    words
  }

  /** Membership probe as a Column: a scala UDF over the element's md5 hex,
    * testing all four word-bits against the broadcast bitset. O(1) per row, no
    * join, no shuffle — the corpus side never moves. (A UDF rather than a
    * codegen expression: the probe is 4 array reads against a broadcast
    * variable, which codegen cannot improve; Spark's own
    * BloomFilterMightContain runtime filter has the same shape.)
    */
  def mightContain(spark: SparkSession, bits: Array[Long], m: Int): Column => Column = {
    val bc = spark.sparkContext.broadcast(bits)
    val probe = udf { hex: String =>
      if (hex == null) false
      else {
        val w = bc.value
        var j = 0
        var all = true
        while (all && j < bloomK) {
          // range-parse: no substring allocation per word (hot path — this
          // runs once per corpus ngram)
          val v = java.lang.Long.parseLong(hex, 8 * j, 8 * j + 8, 16) % m
          all = (w((v >> 6).toInt) & (1L << (v & 63))) != 0
          j += 1
        }
        all
      }
    }
    (c: Column) => probe(c)
  }

  /** Benchmark decontamination via Bloom filter — the 100 TB shape of
    * [[Curation.decontaminate]]: instead of joining the corpus ngrams against
    * a broadcast benchmark hash TABLE, the corpus probes a fixed 128 KiB
    * bitset per row. Flags are a superset of the exact join's (Bloom false
    * positives), which is the safe direction for decontamination: never miss
    * real contamination, occasionally re-check a clean doc.
    *
    * Output per doc: (idCol, n_flagged = distinct flagged ngrams, flagged).
    * Reference contract: same screening role as the conjunctive search gate
    * (reference `main/indexes/indexers/sqllite_indexer.py:69-78`), lifted to
    * corpus hygiene.
    */
  def bloomDecontaminate(
      docs: DataFrame, benchmark: DataFrame,
      idCol: String, textCol: String,
      benchIdCol: String, benchTextCol: String,
      n: Int = 13, m: Int = 1 << 20): DataFrame = {
    val spark = docs.sparkSession
    val benchNg = Dedup.withShingles(benchmark, benchIdCol, benchTextCol, n)
      .select(explode(col("sh")).as("ng")).select(md5(col("ng")).as("h")).distinct()
    val bloom = buildBloom(benchNg, col("h"), m)
    val probe = mightContain(spark, bloom, m)
    val hits = Dedup.withShingles(docs, idCol, textCol, n)
      .select(col(idCol), explode(col("sh")).as("ng"))
      .select(col(idCol), md5(col("ng")).as("h"))
      .filter(probe(col("h")))
      .groupBy(idCol).agg(countDistinct("h").as("n_flagged"))
    docs.select(col(idCol))
      .join(hits, Seq(idCol), "left")
      .select(col(idCol), coalesce(col("n_flagged"), lit(0L)).as("n_flagged"))
      .withColumn("flagged", col("n_flagged") > 0)
  }

  /** DuckDB replica of [[bloomBit]]: positional digit-sum over the j-th
    * 8-hex-char word of `hexCol`, mod m. Companion to
    * [[Curation.hash32DigitSumSql]] (DuckDB has no hex-parse).
    */
  def bloomBitSql(hexCol: String, j: Int, m: Int): String = {
    val sum = (1 to 8).map { i =>
      s"(strpos('0123456789abcdef', substring($hexCol, ${8 * j + i}, 1)) - 1) * ${1L << (4 * (8 - i))}"
    }.mkString(" + ")
    s"(($sum) % $m)"
  }

  // --------------------------------------------------------------- quantiles

  /** Histogram quantile sketch: bucket counts over fixed-width bins, then
    * linear interpolation inside the bucket holding the target rank — the
    * fixed-size replacement for an exact percentile's full sort (t-digest's
    * role, in a deterministic, oracle-replicable form; Spark's own
    * `approx_percentile` is the engine-private swap-in). State per group is
    * `nBins` longs; a 100 TB column profiles in one hash aggregate.
    *
    * Returns per group: one row per requested quantile q with the estimate
    * lo + width·(targetRank − cumBelow)/bucketCount. Exact when values are
    * uniform within buckets; bounded by the bin width always.
    */
  def histQuantiles(df: DataFrame, groupCol: String, valueCol: String,
                    binWidth: Long, nBins: Int, qs: Seq[Double]): DataFrame = {
    require(qs.nonEmpty && qs.forall(q => q > 0 && q < 1), "quantiles in (0,1)")
    // Clamp BOTH ends: values ≥ nBins·width land in the top bin, negatives in
    // bin 0 (without the lower clamp a negative value would yield a negative
    // bucket index and a silently wrong interpolated quantile).
    val bucket = greatest(lit(0L), least(lit(nBins - 1), floor(col(valueCol) / binWidth))).cast("long")
    val hist = df.groupBy(col(groupCol), bucket.as("_b"))
      .agg(count(lit(1)).as("_n"))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(groupCol).orderBy("_b")
    val withCum = hist
      .withColumn("_below", coalesce(sum("_n").over(w) - col("_n"), lit(0L)))
      .withColumn("_total", sum("_n").over(
        org.apache.spark.sql.expressions.Window.partitionBy(groupCol)))
    val spark = df.sparkSession
    import spark.implicits._
    val qDf = qs.toDF("q")
    withCum.crossJoin(broadcast(qDf))
      .withColumn("_target", col("q") * col("_total"))
      .filter(col("_below") < col("_target") &&
        col("_target") <= col("_below") + col("_n"))
      .select(col(groupCol), col("q"),
        round(col("_b") * binWidth +
          lit(binWidth) * (col("_target") - col("_below")) / col("_n"), 4)
          .as("quantile_est"))
  }

  // --------------------------------------------------------------------- kmv

  /** Bounded k-minimum-values buffer: sorted, distinct, at most k entries.
    * Map-side partial aggregation keeps per-group state at k longs no matter
    * how many rows flow through — the whole point of the sketch. The common
    * case (value already present, or buffer full and value above the current
    * k-th minimum) is a binary search with no allocation.
    */
  class KmvAggregator(k: Int) extends Aggregator[Long, Seq[Long], Seq[Long]] {
    override def zero: Seq[Long] = Vector.empty

    override def reduce(buf: Seq[Long], v: Long): Seq[Long] = {
      val idx = buf.search(v)(Ordering.Long)
      idx match {
        case scala.collection.Searching.Found(_) => buf
        case scala.collection.Searching.InsertionPoint(i) =>
          if (buf.length >= k && i >= k) buf
          else {
            val grown = (buf.take(i) :+ v) ++ buf.drop(i)
            if (grown.length > k) grown.take(k) else grown
          }
      }
    }

    override def merge(a: Seq[Long], b: Seq[Long]): Seq[Long] =
      (a ++ b).distinct.sorted.take(k)

    override def finish(buf: Seq[Long]): Seq[Long] = buf
    override def bufferEncoder: Encoder[Seq[Long]] = ExpressionEncoder[Seq[Long]]()
    override def outputEncoder: Encoder[Seq[Long]] = ExpressionEncoder[Seq[Long]]()
  }

  // --------------------------------------------------------------- count-min

  /** Count-min sketch (Cormode & Muthukrishnan, "An improved data stream
    * summary: the count-min sketch and its applications", J. Algorithms 2005)
    * over a stream of elements: a depth-4 × width-`w` counter grid — the four
    * md5 words are the four hash rows, shared with [[bloomBit]] so the oracle
    * replicates the grid exactly. Output (row, bucket, cnt): at most 4·w rows
    * REGARDLESS of stream size — the fixed-size state that replaces a
    * corpus-sized token-count table at 100 TB. One hash aggregate; partial
    * (map-side) combine collapses each partition to ≤ 4·w rows before the
    * exchange.
    */
  def cmsBuild(elems: DataFrame, elemMd5: Column, w: Int): DataFrame =
    elems.select(posexplode(bloomBits(elemMd5, w)).as(Seq("row", "bucket")))
      .groupBy("row", "bucket").agg(count(lit(1)).as("cnt"))

  /** Merge two count-min grids: cell-wise sum. CMS is a linear sketch, so
    * merging shard-local (or micro-batch-local) grids equals sketching the
    * concatenated stream — the property that lets 1000 executors (or a
    * Structured Streaming `foreachBatch` accumulator) each sketch locally and
    * combine at negligible cost. Locked by SketchesSpec.
    */
  def cmsMerge(a: DataFrame, b: DataFrame): DataFrame =
    a.unionByName(b).groupBy("row", "bucket").agg(sum("cnt").as("cnt"))

  /** Point-estimate counts for `candidates` against a built sketch: each
    * candidate probes one bucket per row and takes the min — an overestimate
    * by design (collisions only ever add). The sketch side is ≤ 4·w rows, so
    * the join broadcasts; the candidate stream never shuffles against the raw
    * element stream.
    *
    * The grid is SPARSE (cmsBuild emits no zero-count cells), so the probe
    * must be a LEFT join with `coalesce(cnt, 0)`: an empty cell is a zero
    * counter, and min-over-d-rows must include it. With an inner join a
    * candidate absent from the stream would vanish from the output, and a
    * rare candidate with some empty cells would take min over only its
    * non-empty cells — both break CMS semantics.
    */
  def cmsEstimate(cms: DataFrame, candidates: DataFrame,
                  candCol: String, candMd5: Column, w: Int): DataFrame =
    candidates
      .select(col(candCol), posexplode(bloomBits(candMd5, w)).as(Seq("row", "bucket")))
      .join(broadcast(cms), Seq("row", "bucket"), "left")
      .groupBy(candCol).agg(min(coalesce(col("cnt"), lit(0L))).as("cms_estimate"))

  /** HyperLogLog distinct-count estimate per group (Flajolet et al., "HyperLogLog:
    * the analysis of a near-optimal cardinality estimation algorithm", AofA 2007)
    * with m = 2^6 = 64 registers over the engine-shared 32-bit
    * [[Curation.hash32]]: register = hash mod 64, rank = leading-zero count + 1
    * of the remaining 26 bits (computed as the position of the first '1' in the
    * zero-padded binary string — `instr(lpad(bin(v), 26, '0'), '1')` — which
    * both engines evaluate identically, no float log2 edge cases). Estimate =
    * α·m²/Σ2^(−M_j) with absent registers contributing 2^0, and the standard
    * small-range correction m·ln(m/V) when E ≤ 2.5m and V empty registers
    * remain. Every Σ term is an exact power of two within a 26-bit exponent
    * span, so the double sum is EXACT in both engines — the estimate, not just
    * the registers, hash-gates.
    *
    * State per group is 64 bytes-worth of registers no matter the stream size;
    * partial max-aggregation collapses each partition map-side. Production
    * swap-in at lower oracle fidelity: `approx_count_distinct` (Spark's own
    * HLL++). Registers are mergeable by cell-wise max like [[cmsMerge]].
    */
  def hllDistinct(df: DataFrame, groupCol: String, hashCol: String): DataFrame = {
    val m = 64
    val v = expr(s"$hashCol div $m")
    val rank = when(v === 0L, lit(27)) // all 26 suffix bits zero → rank 26 + 1
      .otherwise(instr(lpad(bin(v), 26, "0"), "1"))
    val regs = df
      .select(col(groupCol), pmod(col(hashCol), lit(m)).as("_reg"), rank.as("_rank"))
      .groupBy(groupCol, "_reg").agg(max("_rank").as("_mj"))
    val alpha = lit(0.7213) / (lit(1.0) + lit(1.079) / lit(m.toDouble))
    regs.groupBy(groupCol)
      .agg(count(lit(1)).as("_present"),
           sum(pow(lit(2.0), -col("_mj").cast("double"))).as("_inv"))
      .withColumn("zeros", (lit(m.toLong) - col("_present")))
      .withColumn("_raw",
        alpha * lit(m.toDouble) * lit(m.toDouble) /
          (col("_inv") + col("zeros").cast("double")))
      .withColumn("hll_estimate", round(
        when(col("_raw") <= lit(2.5 * m) && col("zeros") > 0,
          lit(m.toDouble) * log(lit(m.toDouble) / col("zeros").cast("double")))
          .otherwise(col("_raw")), 4))
      .select(col(groupCol), col("_present").as("n_registers"),
        col("zeros"), col("hll_estimate"))
  }

  /** Merge two KMV sketches (sorted distinct k-minima): union, dedup, keep
    * the k smallest — KMV is a mergeable summary like the CMS grid, so
    * shard-local or micro-batch sketches combine without revisiting data.
    * (This is exactly [[KmvAggregator.merge]], exposed for driver-side /
    * streaming composition.)
    */
  def kmvMerge(a: Seq[Long], b: Seq[Long], k: Int): Seq[Long] =
    new KmvAggregator(k).merge(a, b)

  /** KMV (k-minimum-values) distinct-count estimate per group (Bar-Yossef et
    * al., "Counting distinct elements in a data stream", RANDOM 2002): keep
    * the k smallest distinct 32-bit hashes; if fewer than k exist the count is
    * exact, otherwise estimate (k−1)·2^32 / h_(k). The hash is the shared
    * md5-word [[Curation.hash32]], so the estimate — not just the code path —
    * is replicated by the oracle. Production swap-in: HLL
    * (`approx_count_distinct`) for smaller state; KMV keeps oracle parity and
    * supports set operations on sketches.
    *
    * Input: one row per (group, element); `hashCol` must already hold the
    * hash32 value. Output: (groupCol, n_kmv = |sketch|, kmv_estimate).
    */
  def kmvDistinct(df: DataFrame, groupCol: String, hashCol: String, k: Int): DataFrame = {
    val sketch = udaf(new KmvAggregator(k))
    df.groupBy(col(groupCol))
      .agg(sketch(col(hashCol)).as("_sk"))
      .select(
        col(groupCol),
        size(col("_sk")).cast("long").as("n_kmv"),
        round(
          when(size(col("_sk")) < k, size(col("_sk")).cast("double"))
            .otherwise(lit((k - 1).toDouble) * lit(4294967296.0) / element_at(col("_sk"), k)),
          4).as("kmv_estimate"))
  }
}
