package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Micro-bench for the `lcpArray(sa = prebuilt)` API seam (PLANS.md "SA+LCP
  * reuse"): an SA+LCP mining session over the same corpus, measured two ways —
  *
  *   rebuild: consume suffixArray, then `lcpArray(docs, ...)` which re-runs
  *            the prefix-doubling loop internally (the pre-seam API shape);
  *   seam:    one persisted suffixArray frame consumed, then
  *            `lcpArray(docs, sa, ...)` reusing it.
  *
  * Warmup pass for each shape, then min-of-3; one JSON line on stdout (and
  * SPARK_GRAFT_BENCH_OUT if set). Corpus = the text_lcp_topk slice
  * (documents where doc_id % 5 = 0) at SPARK_GRAFT_SF_DIR.
  */
object LcpSeamBench {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    SparkEntry.configure(spark)
    val S = graft.operators.SuffixArray

    val docs = api.Tables.documents(spark, sfDir)
      .where(col("doc_id") % 5 === 0).select("doc_id", "text")

    def consume(df: DataFrame): Unit =
      df.write.format("noop").mode("overwrite").save()

    def rebuild(): Unit = {
      consume(S.suffixArray(docs, "doc_id", "text"))
      consume(S.lcpArray(docs, "doc_id", "text", maxLcp = 64))
    }
    def seam(): Unit = {
      val sa = S.suffixArray(docs, "doc_id", "text").persist()
      try {
        consume(sa)
        consume(S.lcpArray(docs, sa, "doc_id", "text", 64))
      } finally sa.unpersist()
    }

    def minOf3(f: () => Unit): Double = {
      f() // warmup (JIT + codegen + parquet footers)
      (1 to 3).map { _ =>
        val t0 = System.nanoTime(); f(); (System.nanoTime() - t0) / 1e9
      }.min
    }

    val tRebuild = minOf3(() => rebuild())
    val tSeam = minOf3(() => seam())
    def fmt(v: Double) = "%.3f".formatLocal(java.util.Locale.ROOT, v)
    val json = s"""{"metric":"sa_lcp_session","unit":"sec","rebuild":${fmt(tRebuild)},""" +
      s""""seam":${fmt(tSeam)},"speedup":${fmt(tRebuild / tSeam)},"sf":"$sfDir"}"""
    println(json)
    sys.env.get("SPARK_GRAFT_BENCH_OUT").foreach { p =>
      java.nio.file.Files.write(java.nio.file.Paths.get(p),
        (json + "\n").getBytes(java.nio.charset.StandardCharsets.UTF_8))
    }
    spark.stop()
  }
}
