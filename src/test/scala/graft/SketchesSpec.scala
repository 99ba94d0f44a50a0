package graft

import graft.operators.{Curation, Dedup, Sketches}
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

class SketchesSpec extends AnyFunSuite with SparkSuite {

  import spark.implicits._

  // ------------------------------------------------------------------- bloom

  test("bloom: every inserted element probes true (no false negatives, ever)") {
    val elems = (1 to 200).map(i => s"element number $i").toDF("e")
      .select(md5(col("e")).as("h"))
    val bits = Sketches.buildBloom(elems, col("h"), m = 1 << 16)
    val probe = Sketches.mightContain(spark, bits, 1 << 16)
    val hits = elems.filter(probe(col("h"))).count()
    assert(hits === 200)
  }

  test("bloom: false-positive rate at the design point stays low") {
    val elems = (1 to 200).map(i => s"in $i").toDF("e").select(md5(col("e")).as("h"))
    val bits = Sketches.buildBloom(elems, col("h"), m = 1 << 16)
    val probe = Sketches.mightContain(spark, bits, 1 << 16)
    val out = (1 to 2000).map(i => s"out $i").toDF("e").select(md5(col("e")).as("h"))
    val fp = out.filter(probe(col("h"))).count()
    // 200 elements × 4 bits in 65536 → fill ≈ 1.2%, fp ≈ fill^4 ≈ 2e-8.
    // Allow a generous margin; the point is "rare", not the exact constant.
    assert(fp <= 2)
  }

  test("bloomDecontaminate flags a superset of the exact join's flags") {
    val docs = Seq(
      (1L, "the quick brown fox jumps over the lazy dog again and again today"),
      (2L, "completely unrelated text about spark catalyst optimizer rules"),
      (3L, "the quick brown fox jumps over the lazy dog again and again today ok"),
      (4L, "short doc")).toDF("doc_id", "text")
    val bench = Seq((10L, "the quick brown fox jumps over the lazy dog again and again today"))
      .toDF("bench_id", "bench_text")
    val bloom = Sketches.bloomDecontaminate(
      docs, bench, "doc_id", "text", "bench_id", "bench_text", n = 13)
      .orderBy("doc_id").collect()
    val exact = Curation.decontaminate(
      docs, bench, "doc_id", "text", "bench_id", "bench_text", n = 13)
      .orderBy("doc_id").collect()
    // docs 1 and 3 share full 13-grams with the benchmark; 2 and 4 share none
    assert(exact.map(r => r.getAs[Boolean]("contaminated")).toSeq ===
      Seq(true, false, true, false))
    bloom.zip(exact).foreach { case (b, e) =>
      // no false negatives: exact-contaminated implies bloom-flagged, and the
      // distinct-ngram hit count can only grow under false positives
      if (e.getAs[Boolean]("contaminated")) assert(b.getAs[Boolean]("flagged"))
      assert(b.getAs[Long]("n_flagged") >= e.getAs[Long]("n_contaminated_ngrams"))
    }
  }

  test("bloomBitSql mirrors bloomBit for arbitrary md5 words") {
    // the SQL replica is exercised end-to-end by the driver oracle; here just
    // pin the Spark side: four words, all within [0, m)
    val m = 1 << 20
    val row = Seq("some element").toDF("e").select(md5(col("e")).as("h"))
      .select(Sketches.bloomBits(col("h"), m).as("b")).head()
    val bitsArr = row.getSeq[Long](0)
    assert(bitsArr.length === 4)
    assert(bitsArr.forall(b => b >= 0 && b < m))
    assert(bitsArr.distinct.length > 1) // words differ for a real digest
  }

  // --------------------------------------------------------------- count-min

  test("cmsBuild: grid is bounded by 4×w rows and each row sums to the stream size") {
    val elems = (1 to 1000).map(i => s"item ${i % 137}").toDF("e")
      .select(md5(col("e")).as("h"))
    val cms = Sketches.cmsBuild(elems, col("h"), w = 64)
    assert(cms.count() <= 4L * 64)
    val rowSums = cms.groupBy("row").agg(sum("cnt").as("s"))
      .collect().map(_.getAs[Long]("s"))
    assert(rowSums.length === 4 && rowSums.forall(_ === 1000L))
  }

  test("cmsEstimate never underestimates, and is exact without collisions") {
    val stream = Seq.fill(50)("alpha") ++ Seq.fill(30)("beta") ++
      (1 to 200).map(i => s"noise $i")
    val elems = stream.toDF("e")
    val cms = Sketches.cmsBuild(elems, md5(col("e")), w = 2048)
    val cand = Seq("alpha", "beta", "noise 7").toDF("e")
    val est = Sketches.cmsEstimate(cms, cand, "e", md5(col("e")), w = 2048)
      .collect().map(r => r.getString(0) -> r.getAs[Long]("cms_estimate")).toMap
    assert(est("alpha") >= 50 && est("beta") >= 30 && est("noise 7") >= 1)
    // with 280 items in 2048 buckets × min-of-4, collisions on all four rows
    // at once are vanishingly rare — the estimates should be exact here
    assert(est("alpha") === 50L && est("beta") === 30L)
  }

  test("cmsEstimate reports 0 for candidates absent from the stream") {
    // the grid is sparse (no zero cells), so the probe must LEFT-join and
    // treat an empty cell as a zero counter — an unseen candidate gets
    // estimate 0 (or a tiny collision overcount), never a dropped row, and a
    // rare item's min must include its empty cells
    val elems = (1 to 100).map(i => s"seen $i").toDF("e")
    val cms = Sketches.cmsBuild(elems, md5(col("e")), w = 4096)
    val cand = Seq("seen 1", "never-in-stream", "also-unseen").toDF("e")
    val est = Sketches.cmsEstimate(cms, cand, "e", md5(col("e")), w = 4096)
      .collect().map(r => r.getString(0) -> r.getAs[Long]("cms_estimate")).toMap
    assert(est.size === 3, "every candidate must appear in the output")
    assert(est("seen 1") >= 1L)
    // 100 items / 4096 buckets: an all-four-rows collision is ~impossible
    assert(est("never-in-stream") === 0L && est("also-unseen") === 0L)
  }

  test("cmsMerge of shard-local grids equals the grid of the whole stream") {
    val part1 = (1 to 300).map(i => s"e ${i % 40}").toDF("e")
    val part2 = (301 to 500).map(i => s"e ${i % 55}").toDF("e")
    val whole = Sketches.cmsBuild(part1.unionAll(part2), md5(col("e")), w = 128)
    val merged = Sketches.cmsMerge(
      Sketches.cmsBuild(part1, md5(col("e")), w = 128),
      Sketches.cmsBuild(part2, md5(col("e")), w = 128))
    assert(merged.exceptAll(whole).count() === 0)
    assert(whole.exceptAll(merged).count() === 0)
  }

  // --------------------------------------------------------------- quantiles

  test("histQuantiles: exact on uniform data, bounded by bin width otherwise") {
    // 1..1000 uniform, bin width 10: p50 ≈ 500, p90 ≈ 900 within one bin
    val vals = (1 to 1000).map(v => ("g", v.toLong)).toDF("grp", "v")
    val est = Sketches.histQuantiles(vals, "grp", "v",
        binWidth = 10L, nBins = 200, qs = Seq(0.5, 0.9))
      .collect().map(r => r.getDouble(1) -> r.getAs[Double]("quantile_est")).toMap
    assert(math.abs(est(0.5) - 500) <= 10, s"p50 ${est(0.5)}")
    assert(math.abs(est(0.9) - 900) <= 10, s"p90 ${est(0.9)}")
    // values past the last bin clamp into it rather than vanish
    val clamped = Sketches.histQuantiles(vals, "grp", "v",
        binWidth = 10L, nBins = 5, qs = Seq(0.99))
      .head().getAs[Double]("quantile_est")
    assert(clamped >= 40 && clamped <= 50) // everything ≥ bin 4 lands in bin 4
    // negative values clamp into bin 0 symmetric with the top clamp — without
    // the lower clamp they'd produce negative bucket ids and garbage quantiles
    val withNeg = ((-100 to -1) ++ (1 to 100)).map(v => ("g", v.toLong)).toDF("grp", "v")
    val lo = Sketches.histQuantiles(withNeg, "grp", "v",
        binWidth = 10L, nBins = 20, qs = Seq(0.25))
      .head().getAs[Double]("quantile_est")
    assert(lo >= 0 && lo <= 10, s"negatives must clamp to bin 0, got $lo")
  }

  // --------------------------------------------------------------------- kmv

  test("KmvAggregator keeps a sorted, distinct, bounded buffer") {
    val agg = new Sketches.KmvAggregator(5)
    val buf = Seq(9L, 2L, 7L, 2L, 11L, 1L, 5L, 3L, 9L, 4L)
      .foldLeft(agg.zero)(agg.reduce)
    assert(buf === Seq(1L, 2L, 3L, 4L, 5L))
    // merge keeps global k-minima across partials
    val other = Seq(0L, 2L, 6L).foldLeft(agg.zero)(agg.reduce)
    assert(agg.merge(buf, other) === Seq(0L, 1L, 2L, 3L, 4L))
    // values above a full buffer's max are rejected without growth
    assert(agg.reduce(buf, 100L) === buf)
  }

  test("kmvDistinct is exact below k and estimates above k") {
    val below = (1 to 10).flatMap(i => Seq(("g", i.toLong), ("g", i.toLong)))
      .toDF("grp", "h")
    val exact = Sketches.kmvDistinct(below, "grp", "h", k = 64).head()
    assert(exact.getAs[Long]("n_kmv") === 10L)
    assert(exact.getAs[Double]("kmv_estimate") === 10.0)

    // k = 16 over 2000 uniform-ish hash32 values: estimate within 50% of truth
    val vals = (1 to 2000).map(i => ("g", i)).toDF("grp", "v")
      .select(col("grp"), Curation.hash32(col("v"), "s").as("h"))
    val est = Sketches.kmvDistinct(vals, "grp", "h", k = 16)
      .head().getAs[Double]("kmv_estimate")
    assert(est > 1000 && est < 4000, s"estimate $est far from 2000")
  }

  test("kmvMerge of shard sketches equals the whole-stream sketch") {
    val agg = new Sketches.KmvAggregator(8)
    val s1 = Seq(5L, 1L, 9L, 13L, 3L).foldLeft(agg.zero)(agg.reduce)
    val s2 = Seq(2L, 7L, 1L, 20L, 4L).foldLeft(agg.zero)(agg.reduce)
    val whole = Seq(5L, 1L, 9L, 13L, 3L, 2L, 7L, 1L, 20L, 4L)
      .foldLeft(agg.zero)(agg.reduce)
    assert(Sketches.kmvMerge(s1, s2, 8) === whole)
  }

  test("kmvDistinct partial-aggregates: result is parallelism-independent") {
    val vals = (1 to 500).map(i => ("g", i)).toDF("grp", "v")
      .select(col("grp"), Curation.hash32(col("v"), "s").as("h"))
    val one = Sketches.kmvDistinct(vals.coalesce(1), "grp", "h", k = 32).head()
    val many = Sketches.kmvDistinct(vals.repartition(7), "grp", "h", k = 32).head()
    assert(one.getAs[Double]("kmv_estimate") === many.getAs[Double]("kmv_estimate"))
  }

  // ---------------------------------------------------------------- semdedup

  test("semanticDedup keeps the min-id representative per near-dup star") {
    def v(xs: Double*): Array[Float] = xs.map(_.toFloat).toArray
    val rows = Seq(
      (1L, v(1, 0, 0, 0)),   // centroid-ish A
      (2L, v(0.99, 0.01, 0, 0)), // near-dup of 1 → dropped
      (3L, v(0.98, -0.02, 0, 0)), // near-dup of 1 → dropped
      (4L, v(0, 1, 0, 0)),   // centroid-ish B
      (5L, v(0.01, 0.99, 0, 0)), // near-dup of 4 → dropped
      (6L, v(0, 0, 1, 0))    // assigned to nearer centroid, far from both reps
    ).toDF("id", "vec")
    val centroids = Array(v(1, 0, 0, 0), v(0, 1, 0, 0))
    val out = Dedup.semanticDedup(rows, "id", "vec", centroids, minCosine = 0.9)
      .orderBy("id").collect()
    assert(out.map(_.getAs[Boolean]("kept")).toSeq ===
      Seq(true, false, false, true, false, true))
    // cluster ids are the argmin assignment
    assert(out.map(_.getAs[Long]("cluster_id")).toSeq === Seq(0L, 0L, 0L, 1L, 1L, 0L))
  }

  test("semanticDedup cluster-size preflight warns but never blocks") {
    def v(xs: Double*): Array[Float] = xs.map(_.toFloat).toArray
    val rows = (1L to 12L).map(i => (i, v(1, i * 0.001))).toDF("id", "vec")
    // every row lands in cluster 0 → way over the cap; dedup still completes
    val out = Dedup.semanticDedup(rows, "id", "vec",
      Array(v(1, 0), v(0, 1)), minCosine = 2.0, maxClusterSize = Some(3L))
    assert(out.count() === 12)
    assert(out.filter(!col("kept")).count() === 0) // cos > 2 impossible
  }

  test("semanticDedup drops nothing when the threshold excludes all pairs") {
    def v(xs: Double*): Array[Float] = xs.map(_.toFloat).toArray
    val rows = Seq((1L, v(1, 0)), (2L, v(0, 1)), (3L, v(-1, 0))).toDF("id", "vec")
    val out = Dedup.semanticDedup(rows, "id", "vec",
      Array(v(1, 0), v(0, 1)), minCosine = 0.999)
    assert(out.filter(!col("kept")).count() === 0)
  }

  // --------------------------------------------------------------------- hll

  test("hllDistinct estimates within HLL's expected error band at m=64") {
    // m=64 → relative standard error ≈ 1.04/√64 = 13%; assert 3σ.
    val ids = (1 to 500).map(i => ("g", i.toLong)).toDF("g", "id")
      .select(col("g"), Curation.hash32(col("id"), "t").as("h"))
    val est = Sketches.hllDistinct(ids, "g", "h")
      .collect().head.getAs[Double]("hll_estimate")
    assert(math.abs(est - 500.0) / 500.0 < 0.4, s"estimate $est too far from 500")
  }

  test("hllDistinct is insensitive to duplication (distinct semantics)") {
    val once = (1 to 100).map(i => ("g", i.toLong)).toDF("g", "id")
      .select(col("g"), Curation.hash32(col("id"), "t").as("h"))
    val thrice = once.unionAll(once).unionAll(once)
    val a = Sketches.hllDistinct(once, "g", "h").collect().head
    val b = Sketches.hllDistinct(thrice, "g", "h").collect().head
    assert(a.getAs[Double]("hll_estimate") === b.getAs[Double]("hll_estimate"))
    assert(a.getAs[Long]("n_registers") === b.getAs[Long]("n_registers"))
  }

  test("hllDistinct small-range correction handles tiny groups") {
    val ids = Seq(("g", 1L), ("g", 2L), ("g", 3L)).toDF("g", "id")
      .select(col("g"), Curation.hash32(col("id"), "t").as("h"))
    val row = Sketches.hllDistinct(ids, "g", "h").collect().head
    val est = row.getAs[Double]("hll_estimate")
    assert(est > 0.5 && est < 10.0, s"3 distinct should estimate near 3, got $est")
    assert(row.getAs[Long]("zeros") === 61L)
  }
}
