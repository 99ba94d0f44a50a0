package graft
import org.apache.spark.sql.SparkSession

/** Benchmark main: runs every registered query on SPARK_GRAFT_SF_DIR and prints
  * one JSON line with per-query steady-state seconds. A full warmup pass runs
  * first (JIT + codegen + parquet footer caches), then the timed pass — the
  * number that matters at scale is steady-state scan/shuffle throughput, not
  * first-query JVM warmup.
  */
object Bench {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
      // The generated-class cache defaults to 100 entries; a 176-query board
      // with several codegen fragments per query evicts everything every
      // pass, so each timed pass re-pays Janino compilation for the whole
      // board — measurement artifact, not workload (the steady state this
      // bench reports is hot-code throughput). Sized to hold the full
      // board's fragments across all passes. Static conf: must be set
      // before the first session in the JVM, i.e. exactly here.
      .config("spark.sql.codegen.cache.maxEntries", "10000")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    SparkEntry.configure(spark)

    // Consume via the noop sink, not count(): count() lets Catalyst prune every
    // projection it doesn't need, so map-only queries would time as near-free.
    // The noop writer materializes every output row in full, then discards it.
    def consume(df: org.apache.spark.sql.DataFrame): Unit =
      df.write.format("noop").mode("overwrite").save()
    // Optional name-filter regex (SPARK_GRAFT_BENCH_FILTER) for targeted
    // re-measurement of a few queries; the driver sets no filter → full run.
    val nameFilter = sys.env.get("SPARK_GRAFT_BENCH_FILTER").map(_.r)
    val queries = SparkEntry.queries.toSeq.sortBy(_._1)
      .filter { case (n, _) => nameFilter.forall(_.matches(n)) }
    // Pass-boundary wall stamps on stderr: the r16 driver run timed out
    // (rc=124) with no visibility into WHERE the wall went; these lines cost
    // nothing and make any future timeout diagnosable from the log tail.
    def stamp(msg: String): Unit =
      System.err.println(s"BENCH PASS $msg t=${System.nanoTime() / 1000000000L}s")
    // The warmup pass exists to JIT-compile and codegen-cache every query's
    // code paths, not to measure anything — at the bench SF it cost 411 s of
    // the r16-timeout-sized wall (stamps, this session). Run it on the
    // smaller sf0.01 sibling when one exists next to a LARGER target dir:
    // same queries, same operators, same generated-class cache keys, ~5× less
    // wall. The TIMED passes below are untouched (same SF, same two-pass min
    // methodology); any residual first-pass warmth lands on pass 1 and the
    // per-query min keeps the steady-state number. Documented in
    // OPTIMIZATION_r17.md ("Measurement changes").
    val warmupDir = {
      val parent = new java.io.File(sfDir).getParentFile
      val sib = if (parent == null) null else new java.io.File(parent, "sf0.01")
      val base = new java.io.File(sfDir).getName
      if (sib != null && sib.isDirectory && (base == "sf0.1" || base == "sf1" || base == "sf10"))
        sib.getPath
      else sfDir
    }
    stamp(s"warmup start (dir=$warmupDir)")
    queries.foreach { case (_, fn) =>
      try consume(fn(spark, warmupDir)) catch { case _: Throwable => }
    }
    stamp("warmup done")
    // ------------------------------------------------------- host controls
    // Three rounds of SCALE.md addenda re-litigated the same finding: a loud
    // host penalizes MANY-SHORT-JOB queries (scheduler/dispatch overhead)
    // while sparing single-scan queries, so raw cross-round deltas on
    // short-job rows masquerade as regressions. Two FROZEN control workloads
    // run inside every bench (before, between, and after the timed passes;
    // min kept) and their times ship in the JSON, so any BENCH_r*.json pair
    // is self-normalizing — no more manual worktree A/B.
    //   scan      — ONE wide CPU-bound job (range → modular sum), the
    //               single-long-job shape the noise historically SPARES
    //   shortjobs — 20 sequential 2-stage jobs of 32 tiny tasks each,
    //               pricing job-scheduling overhead, the observed noise mode
    // Both are synthetic (spark.range), so the pins are SF-INDEPENDENT —
    // the same control means the same work at sf0.01 and sf1. The *_pin
    // values are this host QUIET (round 15, min over interleaved runs);
    // `normalized` = raw × (shortjobs_pin / shortjobs_measured), a
    // first-order host correction for the short-job noise mode. Controls are
    // deliberately NOT SparkEntry queries: they must stay frozen across
    // rounds for the ratios to mean anything.
    // quiet-floor pins, measured round 15 over interleaved runs on the
    // driver host (observed quiet: scan 0.123, shortjobs 3.09; the SAME
    // calibration session also saw 7.2s shortjobs minutes later — the noise
    // mode these controls exist to expose)
    val scanPin = 0.12
    val shortjobsPin = 3.00
    def controlScan(): Unit = {
      import org.apache.spark.sql.functions._
      spark.range(200000000L).select(sum(col("id") % 7)).collect()
    }
    def controlShortJobs(): Unit = {
      import org.apache.spark.sql.functions._
      (1 to 20).foreach { i =>
        spark.range(20000).withColumn("k", col("id") % 10)
          .groupBy("k").agg(count(lit(1))).collect()
      }
    }
    def timed(body: () => Unit): Double = {
      val t0 = System.nanoTime(); body(); (System.nanoTime() - t0) / 1e9
    }
    // warm the controls once with the main warmup, then interleave
    controlScan(); controlShortJobs()
    var ctlScan = Double.MaxValue
    var ctlShort = Double.MaxValue
    def sampleControls(): Unit = {
      ctlScan = math.min(ctlScan, timed(() => controlScan()))
      ctlShort = math.min(ctlShort, timed(() => controlShortJobs()))
    }

    // Two timed passes, keep the per-query minimum: steady-state throughput is
    // the quantity of interest, and the min is robust to a transient external
    // CPU burst landing on one query in one pass. A query that THROWS is
    // recorded in `errors` (and printed to stderr) instead of being silently
    // timed as near-0 s — a broken query must never masquerade as a fast one.
    val errors = scala.collection.mutable.LinkedHashMap.empty[String, String]
    def timedPass(): Map[String, Double] = queries.map { case (name, fn) =>
      val t0 = System.nanoTime()
      try consume(fn(spark, sfDir)) catch { case e: Throwable =>
        val msg = s"${e.getClass.getSimpleName}: ${Option(e.getMessage).getOrElse("").take(200)}"
        errors(name) = msg
        System.err.println(s"BENCH ERROR $name — $msg")
      }
      name -> (System.nanoTime() - t0) / 1e9
    }.toMap
    sampleControls()
    stamp("timed1 start")
    val p1 = timedPass()
    stamp("timed1 done")
    sampleControls()
    stamp("timed2 start")
    val p2 = timedPass()
    stamp("timed2 done")
    sampleControls()
    val results = queries.map { case (name, _) =>
      name -> math.min(p1(name), p2(name))
    }
    // conservative correction: only discount noise (never inflate a
    // quieter-than-pin run), and never discount by more than 4× — a factor
    // outside the clamp means the pins need re-calibration, not trusting
    val hostFactor =
      math.max(0.25, math.min(1.0, shortjobsPin / math.max(ctlShort, 1e-9)))
    // Millisecond precision keeps the JSON line short enough to survive the
    // driver's fixed-size stdout-tail capture (BENCH_r06's full-precision
    // doubles pushed the line past the window and left `parsed` null).
    def fmt(v: Double): String = "%.3f".formatLocal(java.util.Locale.ROOT, v)
    val qs = results.map { case (k, v) => "\"" + k + "\":" + fmt(v) }
      .mkString("{", ",", "}")
    val total = results.map(_._2).sum
    // the scan-side factor ships too: r15's three full runs exposed a SECOND
    // noise mode (CPU-scan dilation with QUIET short-jobs — scan control
    // 0.190/0.158/0.072 across runs) that the shortjobs factor cannot see
    val hostFactorScan =
      math.max(0.25, math.min(1.0, scanPin / math.max(ctlScan, 1e-9)))
    val control = s"""{"scan":${fmt(ctlScan)},"shortjobs":${fmt(ctlShort)},""" +
      s""""scan_pin":${fmt(scanPin)},"shortjobs_pin":${fmt(shortjobsPin)},""" +
      s""""host_factor":${fmt(hostFactor)},"host_factor_scan":${fmt(hostFactorScan)}}"""
    val normalized = s"""{"total":${fmt(total * hostFactor)}}"""
    def jstr(s: String): String =
      "\"" + s.flatMap { case '"' => "\\\""; case '\\' => "\\\\"
                         case c if c < ' ' => " "; case c => c.toString } + "\""
    val errJson =
      if (errors.isEmpty) ""
      else errors.map { case (k, v) => jstr(k) + ":" + jstr(v) }
        .mkString(""","errors":{""", ",", "}")
    val json = s"""{"metric":"total","value":${fmt(total)},"unit":"sec","queries":$qs,"control":$control,"normalized":$normalized$errJson,"sf":"$sfDir"}"""
    println(json)
    // Also write the JSON to a file: scraping it from the sbt log tail is
    // fragile (log interleaving left BENCH_r02's parsed field null).
    val outPath = sys.env.getOrElse("SPARK_GRAFT_BENCH_OUT", "bench_out.json")
    java.nio.file.Files.write(java.nio.file.Paths.get(outPath),
      (json + "\n").getBytes(java.nio.charset.StandardCharsets.UTF_8))
    spark.stop()
  }
}
