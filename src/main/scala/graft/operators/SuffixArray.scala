package graft.operators

import org.apache.spark.rdd.RDD
import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{LongType, StructField, StructType}
import org.apache.spark.storage.StorageLevel

/** Distributed suffix-array construction by prefix doubling, and the
  * exact-substring deduplication built on it (Lee et al., "Deduplicating
  * Training Data Makes Language Models Better", arXiv:2107.06499 — their
  * ExactSubstr: flag every span whose length-L window re-occurs in the
  * corpus). `Dedup.repeatedSpans` is the fixed-width HASHED stand-in for this
  * family; this operator is the exact, collision-free form, and additionally
  * yields the full lexicographic suffix ordering (the index behind
  * suffix-based counting, LCP statistics, and maximal-repeat mining).
  *
  * Algorithm (Manber–Myers prefix doubling, the sort-based distributed
  * formulation): state is one row per suffix (doc, off, rank_w) where rank_w
  * orders suffixes by their first w characters. Each round composes
  * (rank_w(s), rank_w(s+k)) with k ≤ w — equality of the pair is equality of
  * the first w+k chars, and pair-lexicographic order IS prefix-lexicographic
  * order (the overlapped middle [k,w) is equal whenever the first component
  * ties) — then re-ranks the pairs globally. Widths grow 1,2,4,… so any
  * target width is reached in O(log L) rounds.
  *
  * Scale shape — the two per-round exchanges are both textbook-safe:
  *   - the SHIFT is `lead(rank, k)` over a per-document window (positions are
  *     dense 0..len-1, so the row k ahead is exactly offset s+k): one hash
  *     exchange on doc id, no self-join. Per-partition state is one document's
  *     positions — bounded by document length, not corpus size.
  *   - the RE-RANK is a global dense rank WITHOUT a global window: range
  *     partition by the pair, sort within partitions, then two narrow passes
  *     (per-partition distinct-class counts → driver cumulative offsets,
  *     #partitions-sized → broadcast back). Equal keys never straddle a range
  *     boundary, so per-partition class numbering composes exactly.
  * Nothing corpus-sized ever reaches the driver; the per-round collect is one
  * small tuple per partition, and it doubles as the all-ranks-distinct
  * early-exit test (no extra job).
  *
  * Character order note: ranks order by Java char code (UTF-16 code unit),
  * which for ASCII corpora equals byte order — the cross-engine-stable case
  * the oracles rely on. Equality classes (what dedup consumes) are exact for
  * any text.
  */
object SuffixArray {

  /** One row per character position: (id, off, r) with r an order-preserving
    * integer over the first `seedWidth` characters of the suffix at off (any
    * order-preserving integer seeds the doubling; density is not required).
    * seedWidth == 1 is the plain char code; seedWidth w ≤ 9 packs w 7-bit
    * ASCII codes big-endian into one non-negative long (max 128⁹−1 =
    * Long.MaxValue), padding past-end with 0 so a shorter suffix sorts before
    * every extension — exactly the −1-sentinel semantics of the doubling
    * rounds. The caller guarantees codes ∈ [1,127] when seedWidth > 1.
    * Empty/null texts contribute no rows (the explicit CASE dodges
    * `sequence(1, 0)`, which Spark reads as DESCENDING).
    */
  private def charPositions(docs0: DataFrame, idCol: String, textCol: String,
                            seedWidth: Int): DataFrame = {
    require(seedWidth >= 1, s"seedWidth must be >= 1, got $seedWidth")
    // seed generation is compute-dense map work over every character; a
    // small-split scan would run it on one core (identity at real scale —
    // graft.core.Spread scaladoc)
    val docs = graft.core.Spread.forCompute(docs0)
    // Widths past the 9-char long pack seed with the LITERAL substring as a
    // STRING key: UTF-8 binary order = the packed order (truncation sorts
    // shorter-first exactly like the 0 pad), globalDenseRank is key-type
    // generic, and one fat rank pass replaces ceil(log2(w/9)) doubling
    // rounds — the trade that wins for finite targets (ranksToWidth gates
    // it); the multi-long PACKED seed was measured and lost (PLANS.md).
    //
    // Both generators are one-pass codegen kernels since r16
    // (plans/SuffixSeedExpression.scala) — the declarative forms ran a
    // per-character interpreted fold (pack) / per-window interpreted
    // substring lambda (literal), the dominant seed-round CPU at every
    // scale; parity with the retired expressions is spec-pinned
    // (SuffixSeedSpec) and the packed kernel's width-1 form also retires
    // the non-ASCII fallback's documented O(len²) ascii(substring(i))
    // re-scan (it walks codepoints once).
    if (seedWidth > 9)
      docs.select(col(idCol).as("id"),
          posexplode(graft.plans.SuffixSeedFunctions.charWindows(
            col(textCol), seedWidth, fullOnly = false)))
        .select(col("id"), col("pos").as("off"), col("col").as("r"))
    else
      docs.select(col(idCol).as("id"),
          posexplode(graft.plans.SuffixSeedFunctions.packedCharWindows(
            col(textCol), seedWidth)))
        .select(col("id"), col("pos").as("off"), col("col").as("r"))
  }

  /** True iff every character of every text has code in [1, 127] — the
    * precondition for the packed multi-char doubling seed. One corpus pass;
    * cheap next to the doubling rounds it saves. Checked as byte-vs-char
    * length equality (UTF-8 is 1 byte per char exactly on ≤ U+007F) plus a
    * NUL-free test — same predicate as the retired `rlike "[^\x01-\x7F]"`
    * scan but whole-stage-codegen arithmetic instead of a java.util.regex
    * walk over every character (guide §1.2 per-task work; the sharded rows
    * pay this gate once per sub-run).
    */
  private def asciiSeedSafe(docs: DataFrame, textCol: String): Boolean =
    docs.where(col(textCol).isNotNull &&
      (octet_length(col(textCol)) =!= length(col(textCol)) ||
        col(textCol).contains("\u0000"))).isEmpty

  /** Result of one global dense-rank pass: the (id, off, rankCol) frame, the
    * persisted sorted RDD backing it (the CALLER unpersists once the next
    * round or the final materialization has consumed it), and the total
    * row/class counts — free by-products of the driver's offset pass.
    */
  private case class Ranked(df: DataFrame, handle: RDD[Row], rows: Long, classes: Long)

  /** Global dense rank of `df` rows by `keyCols`, carrying (id, off) through.
    * Two-pass over a range-partitioned sort: pass 1 counts distinct-key
    * classes per partition (one small tuple per partition to the driver);
    * pass 2 assigns rank = partition base + local class index from the
    * broadcast offsets.
    */
  private def globalDenseRank(df: DataFrame, keyCols: Seq[String], rankCol: String,
                              numPartitions: Int = 0,
                              serialized: Boolean = false): Ranked = {
    val spark = df.sparkSession
    val nKeys = keyCols.length
    // The range exchange runs a SAMPLING job over its input before the
    // shuffle computes it again; the inputs here (char-pack explode, lead
    // window) are expensive enough that paying them twice dominates — cache
    // across the two computations, released right after the stats pass below
    // (by then the shuffle files exist and the sorted RDD is persisted).
    val input = df.select((Seq("id", "off") ++ keyCols).map(col): _*)
      .persist(StorageLevel.MEMORY_AND_DISK)
    val sorted = (if (numPartitions > 0)
        input.repartitionByRange(numPartitions, keyCols.map(col): _*)
      else input.repartitionByRange(keyCols.map(col): _*))
      .sortWithinPartitions(keyCols.map(col): _*)
    // SERIALIZED storage above the position threshold (see ranksToWidth):
    // the loop legitimately holds two rounds' sorted RDDs at once (previous
    // released only after the next round's pass-1 collect), and deserialized
    // Row objects cost ~2-4× their serialized bytes — at 100M+ positions the
    // difference is the single-JVM heap (SCALE.md's 100× OOM). Serialized
    // blocks also evict/spill whole, without the GC churn of object graphs.
    // Below the threshold the deserialized level keeps the fast path
    // (SER costs ~1.5-1.7× wall on the big runs; don't pay it when the
    // working set fits).
    val rdd = sorted.rdd.persist(
      if (serialized) StorageLevel.MEMORY_AND_DISK_SER
      else StorageLevel.MEMORY_AND_DISK)
    // Pass 1: (first key, last key, #rows, #classes) per partition. Keys are
    // small Seq[Any] (longs / the id value); only boundary EQUALITY is checked
    // on the driver — ordering already happened in the range exchange.
    val stats: Array[(Int, Option[(Seq[Any], Seq[Any], Long, Long)])] =
      rdd.mapPartitionsWithIndex { (pi, it) =>
        var first: Seq[Any] = null
        var last: Seq[Any] = null
        var classes = 0L
        var rows = 0L
        it.foreach { row =>
          val k = (2 until 2 + nKeys).map(row.get)
          if (first == null) { first = k; classes = 1L }
          else if (k != last) classes += 1L
          last = k
          rows += 1L
        }
        Iterator.single(pi -> Option(first).map(f => (f, last, rows, classes)))
      }.collect()
    input.unpersist(blocking = false)
    val nParts = stats.length
    val base = new Array[Long](nParts)
    val cont = new Array[Boolean](nParts)
    var cum = 0L
    var nRows = 0L
    var prevLast: Seq[Any] = null
    stats.sortBy(_._1).foreach {
      case (pi, Some((f, l, r, c))) =>
        // Range partitioning keeps equal keys together, so `cont` should never
        // fire; kept as a correctness belt for any partitioner change.
        cont(pi) = prevLast != null && f == prevLast
        base(pi) = cum
        cum += c - (if (cont(pi)) 1L else 0L)
        nRows += r
        prevLast = l
      case (pi, None) => base(pi) = cum
    }
    val bBase = spark.sparkContext.broadcast(base)
    val bCont = spark.sparkContext.broadcast(cont)
    val out = rdd.mapPartitionsWithIndex { (pi, it) =>
      var last: Seq[Any] = null
      var local = 0L
      val b = bBase.value(pi)
      val c = if (bCont.value(pi)) 1L else 0L
      it.map { row =>
        val k = (2 until 2 + nKeys).map(row.get)
        if (last == null || k != last) local += 1L
        last = k
        Row(row.get(0), row.get(1), b + local - c)
      }
    }
    val schema = StructType(Seq(sorted.schema("id"), sorted.schema("off"),
      StructField(rankCol, LongType, nullable = false)))
    Ranked(spark.createDataFrame(out, schema), rdd, nRows, cum)
  }

  /** Doubling loop to width ≥ targetLen (exactly targetLen when `exact`).
    * Returns (id, off, r) with r = the 1-based dense rank of the
    * first-`width` characters of each suffix, eagerly materialized
    * (localCheckpoint) so every round's cache is released here.
    */
  /** Partition count sized to the POSITION count, not the session default:
    * per-task sort/rank state stays ~`rowsPerPartition` rows (~100–200 MB)
    * no matter how big the corpus — the "more partitions" prescription from
    * the round-8 100× OOM (SCALE.md), applied automatically. Capped at 4096
    * (a 100 TB corpus shards by doc range upstream before any single suffix
    * job sees it all).
    *
    * Below `smallCorpusFloor` positions it returns 0 ("unspecified"), letting
    * AQE coalesce the range exchange: an explicit count pins it, and at
    * tens-of-MB shuffle sizes the per-round sampling + pass-1 overhead of 32
    * near-empty sort tasks costs more than the lost parallelism is worth.
    * Measured round-10 A/Bs: at sf0.1 (1.15M positions) pinning 32 cost
    * text_suffix_array 6.15 → 8.41 s and text_lcp_topk 6.83 → 10.25 s,
    * while at the stress x10 scale (9.0M positions) AQE coalesces the
    * ~450 MB shuffle to ~9 partitions of 64 MB, underusing 32 cores:
    * text_suffix_ranks 18.7 s AQE vs 9.2 s pinned, same day. The floor
    * splits the two measured regimes; above it the count is max(session
    * default, position-scaled), exactly the round-9 100× OOM fix.
    *
    * `rowsPerPartition` = 1M (halved from the round-9 2M): at the x100
    * scale (90M positions, GC-bound in a 24 GB single JVM) 92 partitions
    * beat 46 by ~11% (136.7 → 122.3 s) — smaller per-task sort state eases
    * allocation pressure more than the extra sampler/task overhead costs —
    * and 500k showed no further gain (119.8 s). x10 and below are unchanged
    * (the session default floors the count at 32 either way).
    */
  private def autoPartitions(spark: org.apache.spark.sql.SparkSession,
                             positions: Long): Int = {
    val rowsPerPartition = 1000000L
    val smallCorpusFloor = 4000000L
    if (positions < smallCorpusFloor) return 0
    val base = spark.conf.get("spark.sql.shuffle.partitions", "200").toInt
    math.max(base, math.min(4096L, positions / rowsPerPartition + 1L).toInt)
  }

  /** `knownPositions < 0` → count here (one narrow scan); callers that
    * already aggregated the corpus length (e.g. [[suffixArray]]'s maxLen
    * pass) pass it through so the scan isn't paid twice.
    */
  private def ranksToWidth(docs: DataFrame, idCol: String, textCol: String,
                           targetLen: Int, exact: Boolean,
                           knownPositions: Long = -1L): DataFrame = {
    require(targetLen >= 1, "targetLen must be >= 1")
    // one narrow scan: the exploded position count drives the partition count
    val positions = if (knownPositions >= 0L) knownPositions
      else docs.agg(coalesce(sum(length(col(textCol))), lit(0L))
        .cast("long")).head.getLong(0)
    val nParts = autoPartitions(docs.sparkSession, positions)
    // working set ~50 B/row × 2-3 live copies: past ~30M positions the
    // deserialized copies contend with sort execution for a single JVM's
    // heap — switch the loop's persists to serialized storage
    val ser = positions > 30000000L
    // Seed as wide as the packing allows: for an all-ASCII corpus the first
    // round already ranks 9-char prefixes (and range-partitions on a
    // high-cardinality key instead of ~60 raw char codes), cutting the
    // O(log L) rounds to O(log(L/9)). Ranks must be DENSE for the contract,
    // so the seed still passes through globalDenseRank even when it alone
    // reaches targetLen.
    // Seed width choice, ASCII-guarded either way:
    //   - finite EXACT targets past 18 chars (≥ 2 doubling rounds saved)
    //     seed with the literal substring at min(target, 128): on small-to-
    //     mid corpora the per-round fixed job cost dominates the key width
    //     (measured round 11: the width-160 rank run 13.7 → ~4 s at sf0.1),
    //     and at 128 B × positions the one fat exchange is comparable to
    //     the 4 narrow rounds it replaces.
    //   - the open-ended suffix-array path (exact = false) keeps the 9-char
    //     packed seed — its rows and 100× posture are measured and pinned
    //     (SCALE.md); don't move them as a side effect.
    // GRAFT_WIDE_SA_SEED=1 extends the wide literal seed to the open-ended
    // SA path too — an A/B toggle only (default off: the packed-seed SA
    // rows and their 100× posture are pinned in SCALE.md; flipping the
    // default requires a measured win at the stress scales).
    val wideSa = sys.env.get("GRAFT_WIDE_SA_SEED").contains("1")
    val seedWidth =
      if (targetLen > 1 && asciiSeedSafe(docs, textCol)) {
        if ((exact || wideSa) && targetLen > 18) math.min(targetLen, 128)
        else math.min(9, targetLen)
      } else 1
    var current = globalDenseRank(
      charPositions(docs, idCol, textCol, seedWidth), Seq("r"), "r", nParts, ser)
    var width = seedWidth
    var converged = false
    while (width < targetLen && current.classes < current.rows && !converged) {
      val k = if (exact) math.min(width, targetLen - width) else width
      val perDoc = Window.partitionBy("id").orderBy("off")
      val paired = current.df
        .withColumn("r2", coalesce(lead(col("r"), k).over(perDoc), lit(-1L)))
      val next = globalDenseRank(paired, Seq("r", "r2"), "r", nParts, ser)
      // PLATEAU EXIT: classes only ever split (the new key embeds the old
      // rank), so an unchanged count means the partition itself is unchanged
      // — i.e. equal-on-w implies equal-on-(w+k) for every pair. Applying
      // that to the shifted pair (s+k, t+k) inductively gives equality at
      // w+mk for all m: the partition is FINAL. This is the exit that fires
      // on duplicate-heavy corpora, where exactly-equal suffixes keep
      // classes < rows forever and the all-distinct exit never triggers.
      converged = next.classes == current.classes
      // next's pass-1 collect consumed current's sorted RDD; release it.
      current.handle.unpersist(blocking = false)
      current = next
      width += k
    }
    val out = current.df.localCheckpoint()
    current.handle.unpersist(blocking = false)
    out
  }

  /** Dense rank of each suffix's first `targetLen` characters: (id, off,
    * rank), rank 1-based, equal iff the (possibly end-truncated) length-L
    * prefixes are equal, ordered shorter-first lexicographically.
    */
  def prefixRanks(docs: DataFrame, idCol: String, textCol: String, targetLen: Int): DataFrame =
    ranksToWidth(docs, idCol, textCol, targetLen, exact = true)
      .withColumnRenamed("r", "rank").withColumnRenamed("id", idCol)

  /** The full suffix array: every (id, off) suffix position with its 1-based
    * lexicographic rank `sa_rank`; exactly-equal suffixes (across documents)
    * tie-break by (id, off), so ranks are a permutation of 1..n.
    */
  def suffixArray(docs: DataFrame, idCol: String, textCol: String): DataFrame = {
    val agg = docs.agg(coalesce(max(length(col(textCol))), lit(0)).as("m"),
      coalesce(sum(length(col(textCol))), lit(0L)).cast("long").as("n")).head
    val (maxLen, positions) = (agg.getInt(0), agg.getLong(1))
    val ranked = ranksToWidth(docs, idCol, textCol, math.max(maxLen, 1),
      exact = false, knownPositions = positions)
    val tied = globalDenseRank(ranked, Seq("r", "id", "off"), "sa_rank",
      autoPartitions(docs.sparkSession, positions), positions > 30000000L)
    val out = tied.df.localCheckpoint()
    tied.handle.unpersist(blocking = false)
    out.withColumnRenamed("id", idCol)
  }

  /** LCP array over [[suffixArray]]: for every suffix of rank ≥ 2, the
    * longest-common-prefix length in characters (capped at `maxLcp`) with the
    * lexicographically preceding suffix — the structure behind
    * longest-repeated-substring mining, repeat statistics, and
    * distinct-substring counts. Output: (id, off, sa_rank, lcp), n−1 rows.
    *
    * Scale shape: SA-order adjacency is an EQUI-JOIN on the dense rank
    * (sa_rank == prev + 1) — a hash join on a unique key, never a global
    * window; each side carries at most `maxLcp` characters of suffix text,
    * so the shuffled payload is bounded per row regardless of document
    * length. The per-pair LCP is the codegen'd
    * [[graft.plans.CommonPrefixLength]] (one byte-walk, no arrays).
    */
  def lcpArray(docs: DataFrame, idCol: String, textCol: String,
               maxLcp: Int = 256): DataFrame =
    lcpArray(docs, suffixArray(docs, idCol, textCol), idCol, textCol, maxLcp)

  /** LCP from a PREBUILT suffix-array frame (the `(idCol, off, sa_rank)` shape
    * [[suffixArray]] returns) — a caller mining SA + LCP (+ spans) from the
    * same corpus pays the prefix-doubling loop once and reuses the frame,
    * instead of re-running the doubling per derived product. The SA must have
    * been built over exactly `docs`; ranks from a different corpus silently
    * mis-pair adjacent suffixes.
    */
  def lcpArray(docs: DataFrame, sa: DataFrame, idCol: String, textCol: String,
               maxLcp: Int): DataFrame = {
    require(maxLcp >= 1, "maxLcp must be >= 1")
    val withSuf = sa.join(docs.select(col(idCol), col(textCol)), idCol)
      .select(col(idCol), col("off"), col("sa_rank"),
        expr(s"substring($textCol, off + 1, $maxLcp)").as("_suf"))
    val prev = withSuf.select(col("sa_rank").as("_prev_rank"), col("_suf").as("_prev_suf"))
    withSuf.join(prev, col("sa_rank") === col("_prev_rank") + 1)
      .select(col(idCol), col("off"), col("sa_rank"),
        graft.plans.TextHashFunctions.commonPrefixLength(col("_suf"), col("_prev_suf"))
          .as("lcp"))
  }

  /** Window lengths up to this take the DIRECT class path (group literal
    * L-char windows — one narrow exchange of ≤L-byte keys, exact for ANY
    * text); longer windows take the suffix-rank path, whose per-row state
    * stays (id, off, rank) no matter how large L grows.
    */
  private val DirectWindowMaxLen = 128

  /** One row per full-length window: (id, off, _g) with _g the literal
    * L-char substring starting at 0-based off. Docs shorter than L
    * contribute nothing.
    */
  private def windowsOf(docs: DataFrame, idCol: String, textCol: String,
                        len: Int): DataFrame =
    graft.core.Spread.forCompute(docs).select(col(idCol).as("id"),
        posexplode(graft.plans.SuffixSeedFunctions.charWindows(
          col(textCol), len, fullOnly = true)))
      .select(col("id"), col("pos").as("off"), col("col").as("_g"))

  /** ExactSubstr duplicate spans: every maximal union of length-`minLen`
    * windows that re-occur elsewhere in the corpus (arXiv:2107.06499 §4.1 —
    * within-document re-occurrence counts too unless `crossDocOnly`).
    * Collision-free both ways: for minLen ≤ [[DirectWindowMaxLen]] window
    * equality is equality of the LITERAL substrings (one groupBy + one
    * semi-join over ≤minLen-byte keys, no hashes, exact for any text); above
    * that it comes from the suffix ranks, whose exchanged rows stay narrow
    * (id, off, rank) triples regardless of minLen. Output: (id, span_start,
    * span_end, n_grams) — [start, end) character spans per document,
    * overlapping/touching windows merged by the single-exchange scan-line
    * ([[Intervals.mergeIntervals]]).
    */
  def duplicateSpans(docs: DataFrame, idCol: String, textCol: String,
                     minLen: Int, crossDocOnly: Boolean = false,
                     directMaxLen: Int = DirectWindowMaxLen): DataFrame = {
    require(minLen >= 2, "minLen must be >= 2")
    mergedSpans(dupPositions(docs, idCol, textCol, minLen, crossDocOnly,
      directMaxLen), idCol)
  }

  /** The duplicated-position set behind [[duplicateSpans]]: one (id, off)
    * row per length-`minLen` window that re-occurs. Factored out so
    * [[shardedDuplicateSpans]] can union position sets from sub-runs BEFORE
    * the interval merge — merging unioned positions is exactly the global
    * merge; merging merged spans would re-count `n_grams` as spans.
    */
  private def dupPositions(docs: DataFrame, idCol: String, textCol: String,
                           minLen: Int, crossDocOnly: Boolean,
                           directMaxLen: Int): DataFrame = {
    val dupPos =
      if (minLen <= directMaxLen) {
        val wins = windowsOf(docs, idCol, textCol, minLen)
        // "distinct docs >= 2" is min(id) != max(id) — a one-pass map-side
        // partial aggregate, vs countDistinct's expand over the window rows.
        val classes = (if (crossDocOnly)
            wins.groupBy("_g").agg(min(col("id")).as("_a"), max(col("id")).as("_b"))
              .where(col("_a") =!= col("_b"))
          else
            wins.groupBy("_g").agg(count(lit(1)).as("_n")).where(col("_n") >= 2))
          .select("_g")
        wins.join(classes, Seq("_g"), "left_semi")
      } else {
        val ranks = prefixRanks(docs, idCol, textCol, minLen)
          .withColumnRenamed(idCol, "id")
        val lens = docs.select(col(idCol).as("id"), length(col(textCol)).as("_len"))
        // Only positions with a FULL L-gram participate; end-truncated
        // suffixes share ranks among themselves but never with a full window
        // (their missing tail ranks as the -1 sentinel, a class of its own).
        val full = ranks.join(lens, "id").where(col("off") + minLen <= col("_len"))
        val classes = (if (crossDocOnly)
            full.groupBy("rank").agg(min(col("id")).as("_a"), max(col("id")).as("_b"))
              .where(col("_a") =!= col("_b"))
          else
            full.groupBy("rank").agg(count(lit(1)).as("_n")).where(col("_n") >= 2))
          .select("rank")
        full.join(classes, Seq("rank"), "left_semi")
      }
    dupPos.select(col("id").as(idCol), col("off"),
      lit(minLen).as("_w"))
  }

  /** (id, off, _w) window positions → maximal merged [start, end) spans —
    * the shared tail of every span producer here.
    */
  private def mergedSpans(pos: DataFrame, idCol: String): DataFrame = {
    val spans = pos.select(col(idCol),
      col("off").cast("long").as("span_start"),
      (col("off") + col("_w")).cast("long").as("span_end"))
    Intervals.mergeIntervals(spans, Seq(idCol), "span_start", "span_end")
      .select(col(idCol), col("island_start").as("span_start"),
        col("island_end").as("span_end"), col("n_intervals").as("n_grams"))
  }

  /** Remove duplicate spans from the text (arXiv:2107.06499 §4.1's
    * remediation step): given a span frame (idCol, span_start, span_end) of
    * merged, non-overlapping [start, end) character ranges — the output
    * shape of [[duplicateSpans]] / [[contaminatedSpans]] — cut those ranges
    * out of `textCol`, keeping everything between them. Strict ExactSubstr
    * strips every flagged occurrence; keep-one policies are expressed by
    * filtering the span frame before calling. Docs with no spans pass
    * through unchanged. Scale shape: spans collect per document only
    * (bounded by len/minLen entries), one hash join on id, and the rebuild
    * is a single codegen'd `aggregate` over that per-doc array — the corpus
    * text never shuffles beyond the one join.
    */
  def stripSpans(docs: DataFrame, spans: DataFrame, idCol: String,
                 textCol: String): DataFrame = {
    val perDoc = spans.groupBy(col(idCol))
      .agg(sort_array(collect_list(struct(
        col("span_start").cast("long").as("s"),
        col("span_end").cast("long").as("e")))).as("_sp"))
    docs.join(perDoc, Seq(idCol), "left")
      .withColumn(textCol,
        when(col("_sp").isNull, col(textCol)).otherwise(expr(
          s"""aggregate(_sp, named_struct('cur', CAST(0 AS BIGINT), 'acc', ''),
             |  (st, sp) -> named_struct('cur', sp.e,
             |    'acc', concat(st.acc, substring($textCol, CAST(st.cur AS INT) + 1,
             |                                    CAST(sp.s - st.cur AS INT)))),
             |  st -> concat(st.acc, substring($textCol, CAST(st.cur AS INT) + 1)))""".stripMargin)))
      .drop("_sp")
  }

  /** Cross-corpus exact-substring decontamination (arXiv:2107.06499 §6.2's
    * eval-overlap check, made collision-free): every maximal merged span of
    * `train` whose length-`minLen` window occurs verbatim ANYWHERE in
    * `bench`. For minLen ≤ [[DirectWindowMaxLen]], train windows LEFT-SEMI
    * join the bench window set on the literal substring (exact for any
    * text); above that, both corpora union under a (corpus, key) struct id,
    * one doubling run ranks the union, and the semi-join keys on the rank
    * class instead — either way semi, so a window with many bench
    * occurrences can never duplicate a train row. Output:
    * (idCol, span_start, span_end, n_grams) over train documents only.
    */
  def contaminatedSpans(train: DataFrame, bench: DataFrame, idCol: String,
                        textCol: String, minLen: Int,
                        directMaxLen: Int = DirectWindowMaxLen): DataFrame = {
    require(minLen >= 2, "minLen must be >= 2")
    mergedSpans(contamPositions(train, bench, idCol, textCol, minLen,
      directMaxLen), idCol)
  }

  /** The contaminated-position set behind [[contaminatedSpans]] (see
    * [[dupPositions]] for why positions, not spans, are the unit sharded
    * runs union over).
    */
  private def contamPositions(train: DataFrame, bench: DataFrame,
                              idCol: String, textCol: String, minLen: Int,
                              directMaxLen: Int): DataFrame = {
    val dupPos =
      if (minLen <= directMaxLen) {
        // Direct path: train windows LEFT-SEMI join the bench window set on
        // the literal substring — one narrow-key join, no union, no ranks.
        val tw = windowsOf(train, idCol, textCol, minLen)
        val bw = windowsOf(bench, idCol, textCol, minLen).select("_g")
        tw.join(bw, Seq("_g"), "left_semi")
          .select(col("id").as(idCol), col("off"))
      } else {
        val u = train
          .select(struct(lit(0).as("corpus"), col(idCol).as("key")).as("_uid"), col(textCol))
          .unionByName(bench
            .select(struct(lit(1).as("corpus"), col(idCol).as("key")).as("_uid"), col(textCol)))
        val ranks = prefixRanks(u, "_uid", textCol, minLen)
        val lens = u.select(col("_uid"), length(col(textCol)).as("_len"))
        val full = ranks.join(lens, "_uid").where(col("off") + minLen <= col("_len"))
        val benchRanks = full.where(col("_uid.corpus") === 1).select("rank")
        full.where(col("_uid.corpus") === 0)
          .join(benchRanks, Seq("rank"), "left_semi")
          .select(col("_uid.key").as(idCol), col("off"))
      }
    dupPos.select(col(idCol), col("off"), lit(minLen).as("_w"))
  }

  // ------------------------------------------------------------- sharded runs
  //
  // The rank path's doubling run holds the WHOLE input's positions at once;
  // autoPartitions caps its per-task state, but a 100 TB corpus should never
  // enter one run (SCALE.md). Through round 10 that sharding was a comment
  // ("shards by doc range upstream") — these entry points make it code:
  // bounded per-run position counts, with results EXACTLY equal to the
  // global function (equality specs in SuffixArraySpec).

  /** [[contaminatedSpans]] over `train` split into `nShards` doc-hash shards,
    * each checked against the WHOLE benchmark. Exactly the global result —
    * contamination is a per-train-position predicate against all of bench,
    * so sharding train loses nothing — while each doubling run holds
    * |train|/K + |bench| positions instead of |train| + |bench|. At the
    * default `shardParallelism = 1` shards run strictly sequentially
    * (prefixRanks materializes eagerly), so peak cluster state is ONE
    * shard's run — the bounded-memory setting that lets a fixed cluster
    * decontaminate an arbitrarily large train corpus against a (small) eval
    * suite. Callers with executor headroom opt into concurrent shard runs
    * by raising it, accepting that many runs' state live at once.
    */
  def shardedContaminatedSpans(train: DataFrame, bench: DataFrame,
                               idCol: String, textCol: String, minLen: Int,
                               nShards: Int,
                               directMaxLen: Int = DirectWindowMaxLen,
                               shardParallelism: Int = 1): DataFrame = {
    require(minLen >= 2, "minLen must be >= 2")
    require(nShards >= 1, s"nShards must be >= 1, got $nShards")
    if (nShards == 1 || minLen <= directMaxLen)
      // the direct path is a single narrow-key semi-join — already global,
      // shard-free, and the cheapest plan; sharding would only re-scan bench
      return contaminatedSpans(train, bench, idCol, textCol, minLen, directMaxLen)
    val shard = pmod(hash(col(idCol)), lit(nShards))
    // Seed prefilter (exact): a train position can only be contaminated if
    // its window's every seedW-subwindow occurs verbatim in bench — so a
    // train doc sharing NO hashed seedW-gram with bench can contribute
    // nothing and never enters a rank run. One narrow hash semi-join
    // reduces the doubling inputs from |train| to the candidate docs; a
    // hash collision only keeps an extra doc (the run itself is exact).
    val seedW = math.min(minLen, DirectWindowMaxLen)
    val benchSeeds = hashedWindows(bench, idCol, textCol, seedW)
      .select("_g").distinct()
    val candIds = hashedWindows(train, idCol, textCol, seedW)
      .join(benchSeeds, Seq("_g"), "left_semi")
      .select(col("id").as(idCol)).distinct().localCheckpoint()
    val cand = train.join(candIds, Seq(idCol), "left_semi")
    val positions = runConcurrently(shardParallelism, (0 until nShards).map { k =>
      () => contamPositions(cand.where(shard === k), bench, idCol, textCol,
        minLen, directMaxLen)
    })
    // train shards are disjoint → positions never duplicate across runs
    mergedSpans(positions.reduce(_.unionByName(_)), idCol)
  }

  /** (id, _g) rows: xxhash64 of every length-`len` window — the narrow-key
    * seed passes' shared shape (8-byte keys at any window length; callers
    * treat matches as CANDIDATES, so collisions cost work, never
    * correctness).
    */
  private def hashedWindows(docs: DataFrame, idCol: String, textCol: String,
                            len: Int): DataFrame =
    graft.core.Spread.forCompute(docs).select(col(idCol).as("id"),
        explode(graft.plans.SuffixSeedFunctions.charWindows(
          col(textCol), len, fullOnly = true)).as("_w"))
      .select(col("id"), expr("xxhash64(_w)").as("_g"))

  /** Run independent sub-run constructions on up to `parallelism` threads.
    * Each sub-run materializes eagerly (prefixRanks localCheckpoints), so a
    * sequential loop leaves the cluster idle between a run's barrier jobs;
    * concurrent submission lets the scheduler interleave them. The knob IS
    * the peak-state dial: parallelism 1 (the DEFAULT of both sharded entry
    * points) keeps runs strictly sequential — one shard's doubling state
    * live at a time, the 100 TB setting; higher values are an explicit
    * opt-in trading peak executor state for wall-clock on clusters with
    * headroom. Spark job submission is thread-safe by design.
    */
  private def runConcurrently(parallelism: Int,
                              thunks: Seq[() => DataFrame]): Seq[DataFrame] = {
    require(parallelism >= 1, s"shardParallelism must be >= 1, got $parallelism")
    if (parallelism == 1 || thunks.size <= 1) return thunks.map(_())
    val pool = java.util.concurrent.Executors.newFixedThreadPool(
      math.min(parallelism, thunks.size))
    try {
      import scala.concurrent.{Await, ExecutionContext, Future}
      import scala.concurrent.duration.Duration
      implicit val ec: ExecutionContext = ExecutionContext.fromExecutor(pool)
      Await.result(Future.sequence(thunks.map(t => Future(t()))), Duration.Inf)
    } finally pool.shutdown()
  }

  /** [[duplicateSpans]] over doc-hash shards, EXACT across shards via
    * seed-and-extend: per-shard runs catch same-shard duplicates; a single
    * GLOBAL pass at seed width `directMaxLen` (the direct path's literal
    * groupBy — one narrow-key shuffle, no doubling, scale-free) finds every
    * window duplicated ACROSS shards, and only the documents carrying such a
    * seed re-run together as one auxiliary group.
    *
    * Exactness: a duplicate pair (p, q) of length minLen > seed width is
    * either same-shard (that shard's run sees both) or cross-shard — and
    * then EVERY seed-width subwindow of the duplicated text occurs in both
    * shards, so both documents join the auxiliary group and its run sees
    * both. Either way p and q are flagged; conversely every sub-run flags
    * only positions duplicated within a SUBSET of the corpus, hence
    * duplicated globally. Position sets union (distinct — the auxiliary run
    * re-finds some same-shard positions) before one interval merge, so the
    * output frame equals the global function's bit-for-bit.
    *
    * Degradation is graceful and observable, not silent: a corpus where
    * near-everything shares cross-shard seeds pulls near-everything into the
    * auxiliary group (= the global run the caller was avoiding); dedup-scale
    * corpora have sparse duplication, keeping the group small. minLen ≤
    * directMaxLen delegates to the global direct path, which needs no
    * sharding.
    */
  def shardedDuplicateSpans(docs: DataFrame, idCol: String, textCol: String,
                            minLen: Int, crossDocOnly: Boolean = false,
                            nShards: Int = 1,
                            directMaxLen: Int = DirectWindowMaxLen,
                            shardParallelism: Int = 1): DataFrame = {
    require(minLen >= 2, "minLen must be >= 2")
    require(nShards >= 1, s"nShards must be >= 1, got $nShards")
    require(directMaxLen >= 2, s"directMaxLen must be >= 2, got $directMaxLen")
    if (nShards == 1 || minLen <= directMaxLen)
      return duplicateSpans(docs, idCol, textCol, minLen, crossDocOnly, directMaxLen)
    val shard = pmod(hash(col(idCol)), lit(nShards))
    // Global seed pass, ONE narrow groupBy doing double duty. Seeds are
    // hashed seedW-grams (seedW = min(minLen, literal cap) — the longest
    // usable seed is the most selective; exactness only needs seedW ≤
    // minLen, because every duplicate of length ≥ minLen contains a
    // duplicated seedW-gram). From the same aggregate:
    //   - CANDIDATE docs: carry a seed duplicated at all (cross-doc when
    //     crossDocOnly) — docs outside this set cannot contribute ANY dup
    //     position, so every rank run below reads candidates only, not the
    //     corpus. This is what turns "K bounded runs" into "K small runs"
    //     on dedup-sparse corpora.
    //   - AUXILIARY docs: carry a seed duplicated ACROSS shards — only they
    //     re-run together to recover cross-shard pairs exactly.
    // Hash collisions only ADD docs to either set (the runs themselves are
    // literal/rank-exact); a true duplicate always hashes equal.
    val seedW = math.min(minLen, DirectWindowMaxLen)
    val wins = hashedWindows(docs, idCol, textCol, seedW)
      .withColumn("_shard", pmod(hash(col("id")), lit(nShards)))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val seedAgg = wins.groupBy("_g").agg(
      count(lit(1)).as("_n"),
      min(col("id")).as("_ia"), max(col("id")).as("_ib"),
      min(col("_shard")).as("_sa"), max(col("_shard")).as("_sb"))
    val dupSeeds = seedAgg
      .where(if (crossDocOnly) col("_ia") =!= col("_ib") else col("_n") >= 2)
      .select("_g")
    val crossSeeds = seedAgg.where(col("_sa") =!= col("_sb")).select("_g")
    // id sets are tiny (≤ |docs| ids); checkpoint them so the lazy tails of
    // the rank runs never re-derive the window explode, then drop it
    def idsWith(seeds: DataFrame): DataFrame =
      wins.join(seeds, Seq("_g"), "left_semi")
        .select(col("id").as(idCol)).distinct().localCheckpoint()
    val (candIds, auxIds) = (idsWith(dupSeeds), idsWith(crossSeeds))
    wins.unpersist(blocking = false)
    val cand = docs.join(candIds, Seq(idCol), "left_semi")
    val aux = docs.join(auxIds, Seq(idCol), "left_semi")
    val runs = runConcurrently(shardParallelism,
      (0 until nShards).map { k => () =>
        dupPositions(cand.where(shard === k), idCol, textCol, minLen,
          crossDocOnly, directMaxLen)
      } :+ (() => dupPositions(aux, idCol, textCol, minLen, crossDocOnly,
        directMaxLen)))
    mergedSpans(runs.reduce(_.unionByName(_)).distinct(), idCol)
  }
}
