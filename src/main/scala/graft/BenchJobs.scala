package graft
import org.apache.spark.sql.SparkSession

/** Noise-immune bench companion: per-query SPARK JOB COUNT, total task count,
  * and shuffle write bytes (deterministic structural metrics — host CPU
  * steal dilates seconds but cannot change these). Same query registry, same
  * noop-sink consumption as graft.Bench; one warmup execution per query, then
  * one counted execution. Optional name-filter regex via
  * SPARK_GRAFT_BENCH_FILTER; output JSON to SPARK_GRAFT_BENCH_OUT
  * (default bench_jobs.json).
  */
object BenchJobs {
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

    val jobs = new java.util.concurrent.atomic.AtomicLong(0)
    val tasks = new java.util.concurrent.atomic.AtomicLong(0)
    val shuffleWrite = new java.util.concurrent.atomic.AtomicLong(0)
    spark.sparkContext.addSparkListener(new org.apache.spark.scheduler.SparkListener {
      override def onJobStart(j: org.apache.spark.scheduler.SparkListenerJobStart): Unit =
        jobs.incrementAndGet()
      override def onTaskEnd(t: org.apache.spark.scheduler.SparkListenerTaskEnd): Unit = {
        tasks.incrementAndGet()
        val m = t.taskMetrics
        if (m != null) shuffleWrite.addAndGet(m.shuffleWriteMetrics.bytesWritten)
      }
    })

    def consume(df: org.apache.spark.sql.DataFrame): Unit =
      df.write.format("noop").mode("overwrite").save()
    val nameFilter = sys.env.get("SPARK_GRAFT_BENCH_FILTER").map(_.r)
    val queries = SparkEntry.queries.toSeq.sortBy(_._1)
      .filter { case (n, _) => nameFilter.forall(_.matches(n)) }

    def drain(): Unit = { Thread.sleep(400) } // let the listener bus settle

    val out = new StringBuilder
    out.append("{")
    var first = true
    queries.foreach { case (name, fn) =>
      try {
        consume(fn(spark, sfDir)) // warmup (JIT, footer caches)
        drain()
        val j0 = jobs.get(); val t0 = tasks.get(); val s0 = shuffleWrite.get()
        val w0 = System.nanoTime()
        consume(fn(spark, sfDir))
        drain()
        val sec = (System.nanoTime() - w0) / 1e9 - 0.4
        if (!first) out.append(","); first = false
        out.append(s""""$name":{"jobs":${jobs.get() - j0},"tasks":${tasks.get() - t0},""" +
          s""""shuffle_mb":${(shuffleWrite.get() - s0) / 1e6},"sec":${"%.2f".formatLocal(java.util.Locale.ROOT, sec)}}""")
        println(s"[benchjobs] $name jobs=${jobs.get() - j0} tasks=${tasks.get() - t0} " +
          s"shuffleMB=${"%.1f".formatLocal(java.util.Locale.ROOT, (shuffleWrite.get() - s0) / 1e6)} sec=${"%.2f".formatLocal(java.util.Locale.ROOT, sec)}")
      } catch { case e: Throwable =>
        System.err.println(s"BENCHJOBS ERROR $name — ${e.getClass.getSimpleName}: ${Option(e.getMessage).getOrElse("").take(200)}")
      }
    }
    out.append("}")
    val outPath = sys.env.getOrElse("SPARK_GRAFT_BENCH_OUT", "bench_jobs.json")
    java.nio.file.Files.write(java.nio.file.Paths.get(outPath),
      (out.toString + "\n").getBytes(java.nio.charset.StandardCharsets.UTF_8))
    spark.stop()
  }
}
