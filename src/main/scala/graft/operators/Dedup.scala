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

  /** Tokens of a text column — the codegen'd engine tokenizer kernel
    * ([[graft.plans.EngineTokenize]] via [[Search.tokensCol]]), bit-parity
    * with the historical `filter(split(lower(c), '[^a-z0-9]+'), …)` fragment
    * but one byte-scan pass instead of interpreted regex + HOF lambdas. */
  private def toksCol(textCol: String): Column =
    Search.tokensCol(col(textCol))

  // Shingle generation is the codegen'd JoinedTokenWindows kernel since r16
  // (plans/SuffixSeedExpression.scala) — the declarative form ran an
  // interpreted concat_ws lambda per window; parity (incl. the whole-doc
  // fallback for docs shorter than n tokens) is pinned in SuffixSeedSpec.

  /** (id, keep…, sh: array<string>) — word n-gram shingles; docs shorter than
    * n tokens fall back to one whole-text shingle so every doc gets a
    * signature. `keep` columns ride along unchanged (e.g. a stratum key for
    * per-group sketches).
    */
  def withShingles(docs: DataFrame, idCol: String, textCol: String, n: Int = 3,
                   keep: Seq[String] = Nil): DataFrame = {
    val head = col(idCol) +: keep.map(col)
    docs
      .select(head :+ toksCol(textCol).as("_t"): _*)
      .select(head :+ graft.plans.SuffixSeedFunctions
        .joinedTokenWindows(col("_t"), n, shortFallback = true).as("sh"): _*)
  }

  /** Per-document minhash signatures. Signature h = lexicographic MIN over
    * shingles of the h-th disjoint 8-hex-char slice of md5(shingle).
    *
    * Native [[graft.plans.MinHashSig]] expression: shingle bytes stream into a
    * reused digest (no shingle strings allocated) and the 4 slice-minima fold
    * in one pass per document — a NARROW map, no explode and no shuffle at all.
    * The previous explode + md5 + min-groupBy shape was already map-combined,
    * but still shuffled a (doc, 4×8 hex) row per document and paid one codegen'd
    * md5 expression eval per shingle row; at 100 TB removing the corpus-sized
    * exchange entirely is the difference that matters. Parity with the
    * declarative formulation (and the DuckDB oracle) is locked by TextHashSpec.
    */
  def minhashSignatures(docs: DataFrame, idCol: String, textCol: String,
                        shingleN: Int = 3): DataFrame =
    docs
      .select(col(idCol), graft.plans.TextHashFunctions.minhashSig(
        toksCol(textCol), shingleN).as("_sig"))
      .select(col(idCol),
        element_at(col("_sig"), 1).as("sig0"),
        element_at(col("_sig"), 2).as("sig1"),
        element_at(col("_sig"), 3).as("sig2"),
        element_at(col("_sig"), 4).as("sig3"))

  /** Signatures plus LSH band-bucket sizes (2 bands × 2 rows). A doc is a
    * near-dup candidate iff it shares a band bucket with another doc.
    * Output: id, sig0..sig3, band0, band1, b0_size, b1_size, is_candidate.
    */
  def minhashLsh(docs: DataFrame, idCol: String, textCol: String, shingleN: Int = 3): DataFrame = {
    minhashSignatures(docs, idCol, textCol, shingleN)
      .withColumn("band0", concat(col("sig0"), col("sig1")))
      .withColumn("band1", concat(col("sig2"), col("sig3")))
      .withColumn("b0_size", count(lit(1)).over(Window.partitionBy("band0")))
      .withColumn("b1_size", count(lit(1)).over(Window.partitionBy("band1")))
      .withColumn("is_candidate", (col("b0_size") > 1 || col("b1_size") > 1).cast("int"))
  }

  /** Incremental near-dup gate for continuous ingest: flag each NEW document
    * whose minhash band bucket collides with the PERSISTED signature table of
    * the existing corpus ([[minhashSignatures]] output, written once at index
    * time). This is the production shape of dedup-on-arrival: the corpus text
    * is never re-read or re-hashed — only its narrow (id, sig0..sig3) table
    * loads, and the new batch (small by definition) BROADCASTS into the band
    * join, so nothing corpus-sized shuffles per ingest tick.
    *
    * Returns one row per new doc: (idCol, dup_of = smallest colliding
    * existing id or null, is_dup). Band collision is the LSH candidate
    * criterion (same as [[minhashLsh]]); chain [[ngramJaccardPairs]]-style
    * exact verification downstream if the use case needs it.
    *
    * A new doc whose id already exists in the corpus never matches ITSELF —
    * a changed version re-arriving must replace its old revision, not be
    * blocked by its own stale signature (the streaming update path,
    * [[graft.streaming.StreamingUpdate.collectionUpdateWriter]]).
    */
  def incrementalNearDups(
      newDocs: DataFrame, existingSigs: DataFrame,
      idCol: String, textCol: String, existingIdCol: String = "ex_id",
      shingleN: Int = 3): DataFrame = {
    def banded(sigs: DataFrame, id: Column) = sigs.select(
      id.as("_id"),
      explode(array(concat(col("sig0"), col("sig1")),
        concat(col("sig2"), col("sig3")))).as("band"))
    val newBands = banded(
      minhashSignatures(newDocs, idCol, textCol, shingleN), col(idCol))
    val exBands = banded(existingSigs, col(existingIdCol))
    val hits = exBands.withColumnRenamed("_id", "_ex")
      .join(broadcast(newBands), "band")
      .filter(col("_ex") =!= col("_id")) // self-match never blocks a replacement
      .groupBy(col("_id").as(idCol)).agg(min("_ex").as("dup_of"))
    newDocs.select(col(idCol))
      .join(hits, Seq(idCol), "left")
      .withColumn("is_dup", col("dup_of").isNotNull)
  }

  /** Containment near-dup pairs over winnowing fingerprints:
    * |fp(a) ∩ fp(b)| / |fp(a)| — the ASYMMETRIC overlap that catches a
    * document mostly quoted inside a larger one, which symmetric Jaccard
    * under-scores (the small doc's share of the union shrinks as the host
    * grows). Each output row measures how much of id_a lives inside id_b.
    *
    * Shape: fingerprints explode to skinny (id, fp) rows; fingerprints whose
    * document frequency exceeds the df cap are dropped from BOTH the
    * intersection and the denominator — a fingerprint half the corpus shares
    * is boilerplate, not evidence, and it is also exactly the degenerate
    * bucket that makes the self-join quadratic (benched 97 s → 1.5 s at
    * sf0.1 on vocab-limited synthetic text). The self-join then keys on the
    * fingerprint value (bucket-local, pair count Σ|bucket|² with |bucket| ≤
    * cap); shared counts aggregate per ordered pair and divide by id_a's
    * kept-fingerprint count. Winnowed fingerprint sets are already distinct
    * per doc, so the join count IS the intersection size.
    *
    * The cap: `maxFingerprintDf > 0` is an absolute override;
    * `maxFingerprintDf = 0` (default) derives the cap as
    * `max(2, ceil(maxFingerprintDfFraction × corpus doc count))` — a
    * corpus-RELATIVE threshold, because "shared by 1000 docs" means
    * boilerplate at 100k docs but is a meaningful near-dup cluster at 1B.
    * The dropped-fingerprint count is counted eagerly and logged, so cap
    * coverage loss is visible instead of silent (skip that extra job with
    * `logDropStats = false` in hot plan-construction paths); the df table this forces is
    * fingerprint-vocabulary-sized (not corpus-sized) and is cached so the
    * pair join reuses it rather than recomputing the explode.
    */
  def containmentPairs(
      docs: DataFrame, idCol: String, textCol: String,
      k: Int = 7, w: Int = 5, minContainment: Double = 0.5,
      maxFingerprintDf: Int = 0,
      maxFingerprintDfFraction: Double = 0.01,
      logDropStats: Boolean = true): DataFrame = {
    val log = org.slf4j.LoggerFactory.getLogger(getClass)
    // winnowing is compute-dense map work: spread a small-split input across
    // the session's cores first (identity at real scale — Spread scaladoc)
    val ex = TextAnalysis.fingerprintDf(
        graft.core.Spread.forCompute(docs.select(col(idCol), col(textCol))),
        textCol, k, w)
      .select(col(idCol), explode(col("fingerprints")).as("fp"))
    val cap: Long =
      if (maxFingerprintDf > 0) maxFingerprintDf.toLong
      else {
        require(maxFingerprintDfFraction > 0 && maxFingerprintDfFraction <= 1,
          "maxFingerprintDfFraction must be in (0, 1]")
        val nDocs = docs.select(col(idCol)).count()
        math.max(2L, math.ceil(maxFingerprintDfFraction * nDocs).toLong)
      }
    // NOT persisted: the returned DataFrame outlives this call, so a cache
    // here could never be unpersisted and would pin storage for the app's
    // lifetime. The df aggregate instead runs twice — once (map-side
    // combined, narrow) for the visibility stats action below, once inside
    // the consumed plan — a deliberate one-extra-pass trade for zero
    // retained state.
    val dfCounts = ex.groupBy("fp").agg(count(lit(1)).as("_df"))
    // the stats pass is pure visibility — hot callers that construct this plan
    // repeatedly (or that set an absolute cap they already trust) can skip
    // the extra job with logDropStats = false; the cap itself still applies
    if (logDropStats) {
      val stats = dfCounts.agg(
        count(lit(1)).as("n_fp"),
        sum(when(col("_df") > cap, 1L).otherwise(0L)).as("n_dropped")).head()
      val (nFp, nDropped) = (stats.getLong(0), stats.getLong(1))
      if (nDropped > 0)
        log.warn(s"containmentPairs: df cap $cap drops $nDropped of $nFp " +
          s"fingerprints (${"%.2f".format(100.0 * nDropped / math.max(nFp, 1))}%) " +
          "as boilerplate — raise maxFingerprintDf(Fraction) if coverage matters more than cost")
      else
        log.info(s"containmentPairs: df cap $cap, all $nFp fingerprints kept")
    }
    val informative = dfCounts.filter(col("_df") <= cap).select("fp")
    // same join key as the pair join below — co-partitioned, no extra exchange
    val kept = ex.join(informative, Seq("fp"))
    val sizes = kept.groupBy(col(idCol).as("id_a"))
      .agg(count(lit(1)).as("n_a"))
    kept.select(col(idCol).as("id_a"), col("fp"))
      .join(kept.select(col(idCol).as("id_b"), col("fp")), Seq("fp"))
      .filter(col("id_a") =!= col("id_b"))
      .groupBy("id_a", "id_b").agg(count(lit(1)).as("shared"))
      .join(sizes, "id_a")
      .withColumn("containment", col("shared") / col("n_a"))
      .filter(col("containment") >= minContainment)
      .select(col("id_a"), col("id_b"), col("shared"), col("containment"))
  }

  /** Candidate pairs from an LSH band bucket, verified with exact shingle-set
    * Jaccard. The self-join is keyed on the band value — bucket-local, no all-pairs.
    *
    * Join order matters for memory: the band self-join runs on a SKINNY
    * (id, band) projection — candidate ids only — and the heavy shingle arrays
    * join onto that (small) pair list afterwards, keyed by id. Self-joining rows
    * that carry the shingle arrays would put the whole corpus's shingles on both
    * sides of a join (a broadcast/GC hazard the bench exposed at sf0.1: 2s → 32s
    * inside a warm JVM).
    */
  def minhashCandidatePairs(
      docs: DataFrame, idCol: String, textCol: String, minJaccard: Double,
      shingleN: Int = 3): DataFrame = {
    val bands = minhashSignatures(docs, idCol, textCol, shingleN)
      .select(col(idCol), concat(col("sig0"), col("sig1")).as("band0"))
    val cand = bands.select(col(idCol).as("id_a"), col("band0"))
      .join(bands.select(col(idCol).as("id_b"), col("band0")), Seq("band0"))
      .filter(col("id_a") < col("id_b"))
      .select("id_a", "id_b")
    val sh = withShingles(docs, idCol, textCol, shingleN)
      .select(col(idCol), array_sort(array_distinct(col("sh"))).as("sh"))
    cand
      .join(sh.select(col(idCol).as("id_a"), col("sh").as("sh_a")), Seq("id_a"))
      .join(sh.select(col(idCol).as("id_b"), col("sh").as("sh_b")), Seq("id_b"))
      .withColumn("inter",
        graft.plans.TextHashFunctions.sortedIntersectSize(col("sh_a"), col("sh_b")))
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
    val withSh = withShingles(docs, idCol, textCol, n)
      .select(col(idCol), array_sort(array_distinct(col("sh"))).as("sh"))
    val a = withSh.select(col(idCol).as("id_a"), col("sh").as("sh_a"))
    val b = withSh.select(col(idCol).as("id_b"), col("sh").as("sh_b"))
    a.crossJoin(b).filter(col("id_a") < col("id_b"))
      .withColumn("inter",
        graft.plans.TextHashFunctions.sortedIntersectSize(col("sh_a"), col("sh_b")))
      .withColumn("jaccard",
        col("inter") / (size(col("sh_a")) + size(col("sh_b")) - col("inter")))
      .select(col("id_a"), col("id_b"), round(col("jaccard"), 6).as("jaccard"))
  }

  /** Exact-threshold Jaccard similarity join via PREFIX FILTERING (Chaudhuri
    * et al., "A primitive operator for similarity joins", ICDE 2006; Xiao et
    * al., "Efficient similarity joins for near duplicate detection", WWW
    * 2008) — the scale path for what [[ngramJaccardPairs]] computes by brute
    * force: every pair of documents whose distinct-shingle Jaccard meets
    * `threshold`, WITHOUT the all-pairs cross join.
    *
    * Under a global (document-frequency asc, shingle) order, two sets with
    * J ≥ t must share an element inside their first |x| − ⌈t·|x|⌉ + 1
    * elements (the prefix property), so candidate pairs come from a
    * self-join on PREFIX shingles only — rare shingles first, which is what
    * makes the prefix selective. Candidates then verify exactly: intersect
    * counts via two did-keyed joins restricted to candidate pairs, Jaccard
    * compared on its 6dp-ROUNDED value so an ulp cannot flip a pair in or
    * out between engines. Result is PROVABLY equal to the brute-force join
    * — the oracle enforces that literally, and JaccardJoinSpec asserts it
    * against [[ngramJaccardPairs]] on a mutated corpus.
    *
    * Scale shape: everything keys on shingle or did — the df aggregate, the
    * per-doc rank window, the prefix self-join, and the verify joins; no
    * cross join anywhere. Skewed hot shingles are exactly what the df-asc
    * prefix order evicts from prefixes first.
    *
    * Verification is a merge walk over per-doc SORTED shingle arrays
    * ([[graft.plans.SortedIntersectSize]]): the pair list joins each side's
    * array (did-keyed, |cand| rows) and the intersection counts inline in
    * whole-stage codegen — no per-pair token explode, no count aggregation,
    * no per-row hash set. Swapping this for the exploded
    * (pair × token) double-join + groupBy cut the sf0.1 bench 5.5 s → ~2 s;
    * the sort is paid once per document, not per pair.
    */
  def jaccardJoinPrefix(docs: DataFrame, idCol: String, textCol: String,
                        threshold: Double, shingleN: Int = 3): DataFrame = {
    require(threshold > 0 && threshold <= 1, "threshold in (0, 1]")
    // shingle + sort + distinct per doc is compute-dense map work; spread a
    // small-split input first (identity at real scale — Spread scaladoc).
    // The checkpoint then also holds ≥ cores partitions, so the df/prefix
    // explode and both verify joins downstream inherit the parallelism.
    val shArr = withShingles(graft.core.Spread.forCompute(docs), idCol,
        textCol, shingleN)
      .select(col(idCol).as("did"),
        array_sort(array_distinct(col("sh"))).as("sha"))
      .withColumn("n", size(col("sha")))
      .localCheckpoint() // read 3×: df/prefix explode + both verify sides
    val tok = shArr.select(col("did"), col("n"), explode(col("sha")).as("tk"))
    val dfreq = tok.groupBy("tk").agg(count(lit(1)).as("df"))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy("did").orderBy(col("df"), col("tk"))
    val prefix = tok.join(dfreq, "tk")
      .withColumn("rk", row_number().over(w))
      .filter(col("rk") <= col("n") - ceil(lit(threshold) * col("n")) + lit(1))
      .select("did", "tk", "n")
    // length filter (SSJoin): J(A,B) ≥ t forces t·|B| ≤ |A| — a pair whose
    // sizes differ beyond 1/t can't qualify, so it never reaches verification
    val cand = prefix.as("a").join(prefix.as("b"),
        col("a.tk") === col("b.tk") && col("a.did") < col("b.did") &&
          col("a.n") >= ceil(lit(threshold) * col("b.n")) &&
          col("b.n") >= ceil(lit(threshold) * col("a.n")))
      .select(col("a.did").as("ia"), col("b.did").as("ib")).distinct()
    cand
      .join(shArr.select(col("did").as("ia"), col("sha").as("sh_a"),
        col("n").as("na")), "ia")
      .join(shArr.select(col("did").as("ib"), col("sha").as("sh_b"),
        col("n").as("nb")), "ib")
      .withColumn("c",
        graft.plans.TextHashFunctions.sortedIntersectSize(col("sh_a"), col("sh_b")))
      .select(col("ia").as("id_a"), col("ib").as("id_b"),
        round(col("c") / (col("na") + col("nb") - col("c")).cast("double"), 6)
          .as("jaccard"))
      .filter(col("jaccard") >= threshold)
  }

  /** Edit-distance-1 similarity join over a string set via deletion
    * neighborhoods (the FastSS / SymSpell family — Bocek et al., "Fast
    * Similarity Search in Large Dictionaries", 2007): every string emits
    * itself plus each single-character deletion, and two strings at
    * Levenshtein distance ≤ 1 MUST share a variant — substitution: deleting
    * the differing position from both gives the same string; insert/delete:
    * the longer side's deletion IS the shorter string, whose identity variant
    * matches. Variant equality is therefore a COMPLETE candidate generator,
    * and it's an EQUI-join — no cross join, no length-bucketed theta-join;
    * every exchange keys on a variant string or a candidate pair. False
    * positives (e.g. transpositions "ab"/"ba" share variant "a") verify at
    * distance 2 through the codegen'd built-in `levenshtein` and drop.
    *
    * At 100 TB-vocabulary scale the variant table is ~(avgLen+1)× the input
    * and hot variants (short strings' deletions) skew like any token join —
    * the same AQE skew-split lever as the shingle joins applies. Returns
    * (s_a, s_b, dist) with s_a < s_b, exactly the pairs at distance ≤ 1.
    */
  def editDistanceJoin(strs: DataFrame, strCol: String): DataFrame = {
    val vars = strs.select(col(strCol).as("s"))
      .withColumn("v", explode(expr(
        "transform(sequence(0, length(s)), i -> " +
          "concat(substring(s, 1, i), substring(s, i+2)))")))
      .distinct() // duplicate-char deletions collapse ("aab" → "ab" twice)
    vars.as("a").join(vars.as("b"),
        col("a.v") === col("b.v") && col("a.s") < col("b.s"))
      .select(col("a.s").as("s_a"), col("b.s").as("s_b")).distinct()
      .withColumn("dist", levenshtein(col("s_a"), col("s_b")).cast("long"))
      .filter(col("dist") <= 1)
  }

  /** Line-level boilerplate removal (the C4/RefinedWeb-style cleanup): a line
    * occurring more than `maxOccurrences` times ACROSS THE CORPUS is boilerplate
    * (nav bars, license footers, cookie banners) and drops from every document.
    *
    * Returns (id, n_lines, n_kept, cleaned) — original line count, surviving
    * line count, and the text rebuilt from surviving lines in original order.
    *
    * Scale shape: posexplode to (doc, lineNo, line) → one hash-aggregation on
    * the line value for corpus counts → one shuffle join back on line → per-doc
    * rebuild via sorted collect_list. Both shuffles key on the line text; a
    * degenerate hot line (e.g. "") spreads fine because the count side is
    * pre-aggregated map-side before the join.
    */
  def lineDedup(docs: DataFrame, idCol: String, textCol: String,
                maxOccurrences: Int = 2): DataFrame = {
    val lines = docs.select(col(idCol),
      posexplode(split(col(textCol), "\n")).as(Seq("lineNo", "line")))
    val counts = lines.groupBy("line").agg(count(lit(1)).as("_c"))
    lines.join(counts, "line")
      .withColumn("_keep", col("_c") <= maxOccurrences)
      .groupBy(idCol)
      .agg(
        count(lit(1)).as("n_lines"),
        sum(when(col("_keep"), 1L).otherwise(0L)).as("n_kept"),
        // collect_list skips the nulls `when` leaves for dropped lines;
        // array_sort on (lineNo, line) structs restores original order.
        array_join(
          transform(
            array_sort(collect_list(when(col("_keep"),
              struct(col("lineNo"), col("line"))))),
            x => x.getField("line")), "\n").as("cleaned"))
  }

  /** 16-bit SimHash: bit j of the fingerprint is the sign of
    * Σ_tokens (high-bit of md5(token)'s j-th hex nibble ? +1 : −1).
    *
    * Native [[graft.plans.SimHash16]] expression: one md5 per token via a reused
    * digest, single pass, inside whole-stage codegen. The equivalent declarative
    * `aggregate(sequence(1,16), ...)` form re-splices the md5 transform array
    * into each of the 16 iterations — 16× the hashing per document (parity with
    * it is locked by TextHashSpec and the dedup_simhash oracle).
    */
  def simhash16(textCol: String): Column =
    graft.plans.TextHashFunctions.simhash16(toksCol(textCol))

  /** Connected components over a dup-pair edge list by iterative min-label
    * propagation: every node starts as its own component; each round adopts the
    * minimum label among itself and its neighbors; converged when a round changes
    * nothing. The DataFrame-native alternative to GraphX — each round is one
    * join + one hash agg, so a 100 TB edge set runs in O(diameter) shuffles
    * (near-dup graphs have tiny diameters).
    *
    * Returns (id, component) where component = min id reachable. Transitive
    * near-dup clusters fall out directly: keep min-id per component, drop the
    * rest.
    */
  def connectedComponents(
      nodes: DataFrame,  // single column: id
      edges: DataFrame,  // columns: src, dst
      maxIter: Int = 20): DataFrame = {
    val spark = nodes.sparkSession
    // Persist the (usually expensive) edge/node lineage once: every propagation
    // round joins against `sym`, and without the persist each round would
    // recompute the upstream shingle/minhash pipeline from scratch.
    val sym = edges.select(col("src"), col("dst"))
      .unionByName(edges.select(col("dst").as("src"), col("src").as("dst")))
      .persist()
    var labels = nodes.select(col("id"), col("id").as("component")).persist()
    var converged = false
    var i = 0
    while (!converged && i < maxIter) {
      val neighborMin = sym.join(labels, sym("src") === labels("id"))
        .groupBy(col("dst").as("id")).agg(min("component").as("nc"))
      val updated = labels.join(neighborMin, Seq("id"), "left")
        .select(col("id"), least(col("component"), coalesce(col("nc"), col("component")))
          .as("component"))
        .persist()
      val changed = updated.join(labels.withColumnRenamed("component", "old"), "id")
        .filter(col("component") =!= col("old")).limit(1).count()
      labels.unpersist()
      labels = updated
      converged = changed == 0
      i += 1
    }
    sym.unpersist()
    labels
  }

  /** Size-adaptive connected components: LSH banding shrinks the dup graph by
    * orders of magnitude versus the corpus, so the edge list usually fits the
    * driver — union-find there costs one collect instead of O(diameter) rounds
    * of Spark jobs. Beyond `driverMaxEdges`, fall back to the distributed
    * label-propagation loop.
    *
    * The size probe is `limit(driverMaxEdges + 1).collect()` — ONE job that
    * both decides the path and (in the common small-graph case) IS the edge
    * set the union-find consumes. A separate `count()` would materialize the
    * whole upstream LSH pipeline once just to decide, then again to collect
    * (the r4 bench regression on dedup_clusters); the limit also lets Spark
    * stop scanning partitions early when the graph is tiny. Which path ran is
    * logged — at 100 TB you want to KNOW a dup graph overflowed to the
    * iterative fallback rather than discover it in the job timeline.
    */
  def connectedComponentsAuto(
      nodes: DataFrame, edges: DataFrame,
      driverMaxEdges: Long = 5000000L): DataFrame = {
    require(driverMaxEdges > 0 && driverMaxEdges < Int.MaxValue,
      "driverMaxEdges must fit an Int limit")
    val log = org.slf4j.LoggerFactory.getLogger(getClass)
    val e = edges.select(col("src").cast("long"), col("dst").cast("long"))
    val head = e.limit(driverMaxEdges.toInt + 1).collect()
    if (head.length <= driverMaxEdges) {
      log.info(s"connectedComponentsAuto: driver union-find over ${head.length} edges")
      val parent = scala.collection.mutable.Map.empty[Long, Long]
      def find(x: Long): Long = {
        var r = x
        while (parent.getOrElse(r, r) != r) r = parent.getOrElse(r, r)
        var c = x
        while (parent.getOrElse(c, c) != c) { val n = parent(c); parent(c) = r; c = n }
        r
      }
      head.foreach { row =>
        val (a, b) = (find(row.getLong(0)), find(row.getLong(1)))
        if (a != b) parent(math.max(a, b)) = math.min(a, b)
      }
      val compUdf = udf((id: Long) => find(id))
      nodes.select(col("id"), compUdf(col("id")).as("component"))
    } else {
      log.info(s"connectedComponentsAuto: edge count exceeds $driverMaxEdges — " +
        "distributed label propagation")
      val ep = e.persist()
      try connectedComponents(nodes, ep) finally ep.unpersist(blocking = false)
    }
  }

  /** Sign-LSH bucket key for an embedding: the sign pattern of the first `bits`
    * dimensions. Near-identical vectors collide; the near-dup self-join is
    * bucket-local (2^bits buckets bound pair counts).
    */
  /** Cross-document repeated token spans — the signal behind exact substring
    * dedup (Lee et al., "Deduplicating Training Data Makes Language Models
    * Better", ACL 2022, which uses suffix arrays; a suffix array is a
    * single-machine structure, so the distributed shape here is fixed-width
    * span hashing): hash every `nTokens`-token window, keep hashes seen in
    * ≥ `minDocs` distinct documents, and report per document how many of its
    * window positions (and distinct spans) are shared. Callers cut or
    * down-weight those spans (boilerplate headers, license blocks, chrome).
    *
    * Scale: window hashing is a narrow per-row explode (rows ≈ token count —
    * same order as tokenization itself); the only exchanges are the
    * hash-keyed countDistinct and the join back on the hash — both keyed by
    * 32-hex strings, never by text. Degenerate inputs (one span repeated
    * millions of times) concentrate a hash key: the countDistinct side
    * partial-aggregates map-side, and the join back can only fan out to the
    * actual span occurrences, which is the output's own size.
    */
  def repeatedSpans(docs: DataFrame, idCol: String, textCol: String,
                    nTokens: Int = 8, minDocs: Int = 2): DataFrame = {
    require(nTokens >= 2 && minDocs >= 2, "nTokens and minDocs must be >= 2")
    val spans = docs
      .withColumn("_ts", toksCol(textCol))
      .where(size(col("_ts")) >= nTokens)
      .select(col(idCol), explode(graft.plans.SuffixSeedFunctions
        .joinedTokenWindows(col("_ts"), nTokens, shortFallback = false)).as("_w"))
      .select(col(idCol), md5(col("_w").cast("binary")).as("span_hash"))
    // One pass over the corpus: (hash, doc) position counts first, then the
    // ≥minDocs sharing test as a window over that (much smaller) table —
    // no second tokenize+hash of the corpus, no semi-join back.
    val perDoc = spans.groupBy(col("span_hash"), col(idCol))
      .agg(count(lit(1)).as("_np"))
    perDoc
      .withColumn("_nd", count(lit(1)).over(Window.partitionBy("span_hash")))
      .where(col("_nd") >= minDocs)
      .groupBy(col(idCol))
      .agg(sum("_np").as("n_shared_positions"),
        count(lit(1)).as("n_shared_spans"))
  }

  /** Exact token-window duplicate spans (arXiv:2107.06499's ExactSubstr in
    * its TOKEN form — the unit practitioners dedup on): every maximal merged
    * run of `nTokens`-token windows whose literal token sequence re-occurs in
    * another document (or anywhere, when crossDocOnly=false). Collision-free:
    * windows group by the space-joined token string itself — tokens are
    * [a-z0-9]+ so the join is unambiguous — the exact upgrade of
    * [[repeatedSpans]]'s md5 counting form, and the token-unit sibling of
    * [[SuffixArray.duplicateSpans]]'s character form. Output: (idCol,
    * tok_start, tok_end, n_windows) with [start, end) 0-based token-index
    * spans, overlapping/touching windows merged by the scan-line interval
    * merge. Scale shape: one groupBy + one left-semi join on bounded window
    * strings, then the single-exchange merge — no hashing, no self-join.
    */
  def exactTokenSpans(docs: DataFrame, idCol: String, textCol: String,
                      nTokens: Int = 8, crossDocOnly: Boolean = true): DataFrame = {
    require(nTokens >= 2, "nTokens must be >= 2")
    val wins = docs
      .withColumn("_ts", toksCol(textCol))
      .where(size(col("_ts")) >= nTokens)
      .select(col(idCol).as("_id"), posexplode(graft.plans.SuffixSeedFunctions
        .joinedTokenWindows(col("_ts"), nTokens, shortFallback = false)))
      .select(col("_id"), col("pos").as("_off"), col("col").as("_g"))
    // "distinct docs >= 2" as min != max: one-pass partial agg, no expand.
    val classes = (if (crossDocOnly)
        wins.groupBy("_g").agg(min(col("_id")).as("_a"), max(col("_id")).as("_b"))
          .where(col("_a") =!= col("_b"))
      else
        wins.groupBy("_g").agg(count(lit(1)).as("_n")).where(col("_n") >= 2))
      .select("_g")
    val dupPos = wins.join(classes, Seq("_g"), "left_semi")
      .select(col("_id").as(idCol), col("_off").cast("long").as("tok_start"),
        (col("_off") + nTokens).cast("long").as("tok_end"))
    Intervals.mergeIntervals(dupPos, Seq(idCol), "tok_start", "tok_end")
      .select(col(idCol), col("island_start").as("tok_start"),
        col("island_end").as("tok_end"), col("n_intervals").as("n_windows"))
  }

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

  /** SemDeDup (Abbas et al., "SemDeDup: Data-efficient learning at web-scale
    * through semantic deduplication", arXiv:2303.09540): cluster the embedding
    * space, then deduplicate WITHIN each cluster by cosine similarity, keeping
    * one representative per near-dup group. Clustering makes the quadratic
    * pair step cluster-local — pair counts are bounded by max cluster size,
    * never corpus², the same containment discipline as the LSH band joins.
    *
    * Representative choice is the deterministic greedy rule: a row is dropped
    * iff some SMALLER-id row in its cluster is within `minCosine` — so every
    * near-dup star keeps exactly its min-id member, at any parallelism.
    *
    * `centroids` are caller-supplied (production: MLlib k-means fit on a
    * sample, like [[Ann.buildIvf]]; tests/oracle: pinned rows) — assignment
    * reuses [[Ann.assignLists]]'s codegen'd argmin, so this composes with an
    * existing IVF index's centroids for free.
    *
    * Output: (idCol, cluster_id, kept). One shuffle: the cluster-keyed
    * self-join.
    */
  def semanticDedup(
      emb: DataFrame, idCol: String, vecCol: String,
      centroids: Array[Array[Float]], minCosine: Double,
      maxClusterSize: Option[Long] = None): DataFrame = {
    import graft.plans.VectorFunctions.cosineF
    val assigned = Ann.assignLists(emb, vecCol, centroids)
      .select(col(idCol), col(vecCol), col("listId").cast("long").as("cluster_id"))
    // Opt-in skew preflight (the AsOf.maxRowsPerKey pattern): the pair step is
    // quadratic in cluster size, so one fat cluster dominates the stage. One
    // cheap aggregate over (cluster_id) only; the dedup proceeds — degraded,
    // not broken — but the caller learns WHICH centroids need re-fitting
    // (SemDeDup's own remedy: more/balanced clusters).
    maxClusterSize.foreach { cap =>
      val fat = assigned.groupBy("cluster_id").agg(count(lit(1)).as("n"))
        .filter(col("n") > cap).orderBy(col("n").desc).limit(5).collect()
      if (fat.nonEmpty)
        org.slf4j.LoggerFactory.getLogger(getClass).warn(
          s"semanticDedup: ${fat.length}+ cluster(s) exceed maxClusterSize=$cap — " +
            s"fattest: ${fat.mkString(", ")}; pair counts grow quadratically " +
            "in cluster size (re-fit with more centroids to split them)")
    }
    val a = assigned.select(col(idCol).as("id_a"), col("cluster_id"), col(vecCol).as("v_a"))
    val b = assigned.select(col(idCol).as("id_b"), col("cluster_id"), col(vecCol).as("v_b"))
    val dropped = a.join(b, Seq("cluster_id"))
      .filter(col("id_a") < col("id_b"))
      .filter(cosineF(col("v_a"), col("v_b")) >= minCosine)
      .select(col("id_b").as(idCol)).distinct()
    assigned.select(col(idCol), col("cluster_id"))
      .join(dropped.withColumn("_drop", lit(true)), Seq(idCol), "left")
      .select(col(idCol), col("cluster_id"), col("_drop").isNull.as("kept"))
  }

  /** Token n-gram overlap fraction against a benchmark — the SCORED
    * companion to the span-level decontamination in SuffixArray: instead of
    * exact contaminated character spans, each train document gets the share
    * of its token n-gram OCCURRENCES that appear verbatim anywhere in the
    * benchmark (the "what fraction of this document is eval data"
    * leaderboard number; rank by it, then strip or drop the top).
    *
    * Shape at 100 TB: the benchmark side is an EVAL SUITE — megabytes by
    * nature — so its distinct grams broadcast and the train side is one
    * embarrassingly-parallel pass (tokenize → slide → hash-probe), no
    * shuffle except the per-doc count aggregation. Documents with zero
    * overlap never leave the semi-join.
    */
  def ngramOverlap(train: DataFrame, bench: DataFrame,
                   idCol: String, textCol: String, n: Int): DataFrame = {
    require(n >= 1, s"n must be >= 1, got $n")
    def grams(df: DataFrame) = df
      .select(col(idCol).as("id"),
        expr(s"filter(split($textCol, ' '), x -> x <> '')").as("_w"))
      .where(size(col("_w")) >= n)
      .select(col("id"), graft.plans.SuffixSeedFunctions
        .joinedTokenWindows(col("_w"), n, shortFallback = false).as("_gs"))
    val benchGrams = broadcast(
      grams(bench).select(explode(col("_gs")).as("_g")).distinct())
    grams(train)
      .select(col("id"), size(col("_gs")).cast("long").as("n_grams"),
        explode(col("_gs")).as("_g"))
      .join(benchGrams, Seq("_g"), "left_semi")
      .groupBy("id", "n_grams").agg(count(lit(1)).as("n_hit"))
      .select(col("id").as(idCol), col("n_grams"), col("n_hit"),
        round(col("n_hit") / col("n_grams"), 6).as("overlap_frac"))
  }
}
