package graft
import org.apache.spark.sql.SparkSession
import scala.collection.mutable

/** Per-JOB profile of one (or a few) registered queries: job wall, task
  * count, and the callsite/description that submitted it — the view that
  * tells you WHICH of a lifecycle row's dozens of sequential actions own the
  * wall clock (graft.Bench times whole queries; BenchJobs counts totals).
  * Diagnostic tool only; not part of the driver contract.
  *
  * Usage: SPARK_GRAFT_BENCH_FILTER=<regex> sbt "runMain graft.ProfileJobs"
  */
object ProfileJobs {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
      .config("spark.sql.codegen.cache.maxEntries", "10000")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    SparkEntry.configure(spark)

    case class J(id: Int, start: Long, var end: Long = 0L,
                 tasks: Int = 0, site: String)
    val live = mutable.Map.empty[Int, J]
    val done = mutable.ArrayBuffer.empty[J]
    spark.sparkContext.addSparkListener(new org.apache.spark.scheduler.SparkListener {
      override def onJobStart(j: org.apache.spark.scheduler.SparkListenerJobStart): Unit = {
        val site = Option(j.properties)
          .flatMap(p => Option(p.getProperty("callSite.short")))
          .orElse(j.stageInfos.lastOption.map(_.name.takeWhile(_ != '\n').take(70)))
          .getOrElse("?")
        val nt = j.stageInfos.map(_.numTasks).sum
        live.synchronized { live(j.jobId) = J(j.jobId, j.time, tasks = nt, site = site) }
      }
      override def onJobEnd(j: org.apache.spark.scheduler.SparkListenerJobEnd): Unit =
        live.synchronized {
          live.remove(j.jobId).foreach { rec => rec.end = j.time; done += rec }
        }
    })

    def consume(df: org.apache.spark.sql.DataFrame): Unit =
      df.write.format("noop").mode("overwrite").save()
    val nameFilter = sys.env.get("SPARK_GRAFT_BENCH_FILTER").map(_.r)
    val queries = SparkEntry.queries.toSeq.sortBy(_._1)
      .filter { case (n, _) => nameFilter.forall(_.matches(n)) }

    queries.foreach { case (name, fn) =>
      consume(fn(spark, sfDir)) // warmup
      done.synchronized { done.clear() }
      val t0 = System.nanoTime()
      consume(fn(spark, sfDir))
      val wall = (System.nanoTime() - t0) / 1e9
      Thread.sleep(500)
      val jobs = done.synchronized { done.sortBy(_.start).toVector }
      println(f"== $name wall=$wall%.2fs jobs=${jobs.size}")
      var prevEnd = 0L
      jobs.foreach { j =>
        val gap = if (prevEnd == 0) 0.0 else (j.start - prevEnd) / 1e3
        prevEnd = math.max(prevEnd, j.end)
        println(f"  job ${j.id}%4d dur=${(j.end - j.start) / 1e3}%7.3fs gap=$gap%7.3fs tasks=${j.tasks}%4d ${j.site}")
      }
      val busy = jobs.map(j => j.end - j.start).sum / 1e3
      println(f"  sum(job dur)=$busy%.2fs  (wall - jobs = driver/plan time)")
    }
    spark.stop()
  }
}
