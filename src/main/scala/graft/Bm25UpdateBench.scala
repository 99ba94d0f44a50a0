package graft

import org.apache.spark.sql.functions._
import org.apache.spark.sql.SparkSession

/** Micro-bench for the BM25 incremental merge's cost shape (PLANS.md "bm25
  * postings index"): the SAME small update — replace a fixed ~200-doc set —
  * against corpora of growing size. With O(changed) stats maintenance the
  * update's wall time AND its task-input bytes must stay ~flat as the corpus
  * grows; the pre-round-10 full stats re-derivation read the whole
  * (term, docId, docLen) projection per update, which would scale both
  * linearly. One JSON line on stdout with a row per multiplier.
  *
  * Args: corpus multipliers (default "1 8").
  */
object Bm25UpdateBench {
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

    val mults = (if (args.nonEmpty) args.toSeq else Seq("1", "8")).map(_.toInt)

    // task-input bytes across every job between reset() and read() — the
    // "how much did this update actually read" meter
    val bytesRead = new java.util.concurrent.atomic.AtomicLong(0L)
    spark.sparkContext.addSparkListener(new org.apache.spark.scheduler.SparkListener {
      override def onTaskEnd(te: org.apache.spark.scheduler.SparkListenerTaskEnd): Unit = {
        if (te.taskMetrics != null)
          bytesRead.addAndGet(te.taskMetrics.inputMetrics.bytesRead)
        ()
      }
    })
    def drained[A](f: => A): A = { val r = f; Thread.sleep(1500); r } // let the bus flush

    val rows = mults.map { mult =>
      val base = api.Tables.documents(spark, sfDir).select("doc_id", "text")
      val chunks = spark.range(0, mult).toDF("rep").crossJoin(base)
        .select((col("doc_id") * mult + col("rep")).as("chunkId"),
          col("text").as("indexedData"),
          col("doc_id"), col("rep"))
        .persist()
      val nChunks = chunks.count()
      // the SAME ~200 logical docs change at every multiplier — the update is
      // constant-size by construction, only the corpus grows around it
      val changedKeys = chunks.filter(col("doc_id") < 200 && col("rep") === 0)
      val removed = changedKeys.select(col("chunkId").as("docId"), col("indexedData"))
        .persist()
      val nChanged = removed.count()
      val replacement = changedKeys
        .select((col("chunkId") + lit(1000000000L)).as("chunkId"),
          concat(col("indexedData"), lit(" refreshed revision")).as("indexedData"))
        .persist()
      replacement.count()

      val dir = java.nio.file.Files.createTempDirectory(s"graft_bm25_ub_$mult").toString
      val idx = new graft.operators.Bm25Indexer(
        spark, dir, chunksPath = s"$dir/unused")
      val tb0 = System.nanoTime()
      idx.index(chunks.select(col("chunkId"), col("indexedData")))
      val buildSec = (System.nanoTime() - tb0) / 1e9 // O(corpus) — the contrast

      val t0 = System.nanoTime()
      bytesRead.set(0L)
      val sec = drained {
        idx.updateIncremental(removed, replacement)
        (System.nanoTime() - t0) / 1e9
      }
      val read = bytesRead.get()
      chunks.unpersist(); removed.unpersist(); replacement.unpersist()
      (mult, nChunks, nChanged, buildSec, sec, read)
    }

    def fmt(v: Double) = "%.3f".formatLocal(java.util.Locale.ROOT, v)
    val body = rows.map { case (mult, n, ch, buildSec, sec, read) =>
      s"""{"mult":$mult,"docs":$n,"changed":$ch,"build_sec":${fmt(buildSec)},""" +
        s""""update_sec":${fmt(sec)},"update_read_mb":${read / 1048576}}"""
    }.mkString("[", ",", "]")
    println(s"""{"metric":"bm25_update_scaling","unit":"sec","rows":$body,"sf":"$sfDir"}""")
    spark.stop()
  }
}
