package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Micro-bench for the bucketed collection layout (PLANS.md "bucketed
  * update"): the SAME incremental update — replace 0.1% of documents —
  * measured against a flat-layout collection (full docs+chunks staging
  * rewrite) and a bucketed one (dirty-bucket rewrite only). Both paths use
  * the incremental BM25 postings merge, so the delta isolates the table
  * rewrite. Corpus = the documents table at SPARK_GRAFT_SF_DIR; one JSON
  * line on stdout.
  */
object BucketedUpdateBench {
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

    // optional first arg: corpus multiplier (replicate docs with distinct
    // ids) — the update win is a function of table-size : changed-size, so
    // the crossover only shows when the table dwarfs the update
    val mult = if (args.nonEmpty) args(0).toInt else 1
    // second arg: changed-set selectivity 1/M — the dirty-bucket count is
    // min(changed, nBuckets), so the partial-rewrite win needs changed ≪ 64
    val m = if (args.length > 1) args(1).toLong else 1000L
    val base = api.Tables.documents(spark, sfDir).select("doc_id", "lang", "text")
    val docs = spark.range(0, mult).toDF("rep").crossJoin(base)
      .select(concat(col("doc_id"), lit("_"), col("rep")).as("id"),
        concat(lit("doc://"), col("doc_id"), lit("_"), col("rep")).as("url"),
        map(lit("lang"), col("lang")).as("metadata"),
        col("text"))
      .persist()
    val nDocs = docs.count()
    val changed = docs.filter(expr(s"hash(id) % $m = 7"))
      .withColumn("text", concat(col("text"), lit(" refreshed revision")))
      .persist()
    val nChanged = changed.count()

    val tmp = java.nio.file.Files.createTempDirectory("graft-bucket-bench").toString
    val cm = new graft.core.CollectionManager(
      spark, tmp, graft.functions.HashingEmbedder.default,
      new graft.functions.TextSplitter(400, 100))

    def time(f: => Unit): Double = {
      val t0 = System.nanoTime(); f; (System.nanoTime() - t0) / 1e9
    }

    // bytes of docs+chunks files REWRITTEN by an update: fingerprint every
    // data file before, sum sizes of files that are new or changed after —
    // the IO cost that scales with table size on the flat path and with the
    // dirty-bucket count on the bucketed one
    def stamps(root: String): Map[String, (Long, Long)] = {
      val out = scala.collection.mutable.Map.empty[String, (Long, Long)]
      java.nio.file.Files.walk(java.nio.file.Paths.get(root)).forEach { p =>
        val f = p.toFile
        if (f.isFile) out(p.toString) = (f.length(), f.lastModified())
      }
      out.toMap
    }
    def rewritten(root: String)(f: => Unit): Long = {
      val before = stamps(root)
      f
      stamps(root).collect {
        case (p, st) if !before.get(p).contains(st) => st._1
      }.sum
    }

    cm.create("flat", docs)
    cm.create("bucketed", docs, nBuckets = 64)
    // warmup update on each (JIT + codegen), then the timed run
    cm.update("flat", changed); cm.update("bucketed", changed)
    var bFlat = 0L; var bBucketed = 0L
    val tFlat = time { bFlat = rewritten(s"$tmp/flat")(cm.update("flat", changed)) }
    val tBucketed = time {
      bBucketed = rewritten(s"$tmp/bucketed")(cm.update("bucketed", changed))
    }

    def fmt(v: Double) = "%.3f".formatLocal(java.util.Locale.ROOT, v)
    println(s"""{"metric":"bucketed_update","unit":"sec","docs":$nDocs,""" +
      s""""changed":$nChanged,"flat":${fmt(tFlat)},"bucketed":${fmt(tBucketed)},""" +
      s""""speedup":${fmt(tFlat / tBucketed)},"flat_rewritten_mb":${bFlat / 1048576},""" +
      s""""bucketed_rewritten_mb":${bBucketed / 1048576},"sf":"$sfDir"}""")
    spark.stop()
  }
}
