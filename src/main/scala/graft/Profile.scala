package graft
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Ad-hoc stage profiler for slow queries (scratch tool, rewritten per
  * investigation; current target: j3b_bucketed_lifecycle creep — wall time
  * and SPARK JOB COUNT per lifecycle phase).
  */
object Profile {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    SparkEntry.configure(spark)

    val jobs = new java.util.concurrent.atomic.AtomicInteger(0)
    val stages = new java.util.concurrent.ConcurrentLinkedQueue[(String, Long)]()
    spark.sparkContext.addSparkListener(new org.apache.spark.scheduler.SparkListener {
      override def onJobStart(j: org.apache.spark.scheduler.SparkListenerJobStart): Unit =
        jobs.incrementAndGet()
      override def onStageCompleted(
          s: org.apache.spark.scheduler.SparkListenerStageCompleted): Unit = {
        val i = s.stageInfo
        val ms = (for (a <- i.submissionTime; b <- i.completionTime) yield b - a).getOrElse(0L)
        stages.add((i.name, ms))
      }
    })
    def time[A](label: String)(f: => A): A = {
      stages.clear()
      val j0 = jobs.get(); val t0 = System.nanoTime(); val r = f
      // listener is async — give the bus a moment to drain
      Thread.sleep(300)
      println(f"[profile] $label: ${(System.nanoTime() - t0) / 1e9}%.2f s, ${jobs.get() - j0} jobs")
      import scala.jdk.CollectionConverters._
      stages.asScala.groupBy(_._1).view.mapValues(v => (v.size, v.map(_._2).sum))
        .toSeq.sortBy(-_._2._2).take(12).foreach {
          case (s, (n, ms)) => println(s"[profile]    $ms ms over $n stages: $s")
        }
      r
    }

    for (i <- 1 to 2) {
      val tmp = java.nio.file.Files.createTempDirectory("graft_profile_").toString
      val cm = new graft.core.CollectionManager(
        spark, tmp, graft.functions.HashingEmbedder.default)
      def asDocs(df: DataFrame) = df.select(
        col("doc_id").cast("string").as("id"),
        concat(lit("doc://"), col("doc_id")).as("url"),
        map(lit("lang"), col("lang")).as("metadata"),
        col("text"),
        array(struct(col("text").as("indexedData"),
          map().cast("map<string,string>").as("metadata"))).as("chunks"))
      val docs = graft.api.Tables.documents(spark, sfDir)
      time(s"run$i create")(cm.create("j3b", asDocs(docs), nBuckets = 16))
      val hwm = cm.readManifest("j3b").lastIndexItemId
      time(s"run$i update")(cm.update("j3b", asDocs(docs.filter(col("doc_id") % 7 === 0)
        .withColumn("text", concat(col("text"), lit(" updated"))))))
      val delIds = docs.filter(col("doc_id") % 13 === 0)
        .select(col("doc_id").cast("string")).collect().map(_.getString(0)).toSeq
      time(s"run$i delete")(cm.delete("j3b", delIds))
      time(s"run$i manifestStats")(cm.manifestStats("j3b"))
      val conf = spark.sessionState.newHadoopConf()
      time(s"run$i rowCount chunks")(
        graft.core.ParquetMeta.rowCount(conf, s"$tmp/j3b/chunks"))
      time(s"run$i columnMax chunks")(
        graft.core.ParquetMeta.columnMaxLong(conf, s"$tmp/j3b/chunks", "chunkId"))
      time(s"run$i rowCount docs")(
        graft.core.ParquetMeta.rowCount(conf, s"$tmp/j3b/documents"))
      println(s"[profile] run$i chunk files: " + {
        val d = new java.io.File(s"$tmp/j3b/chunks")
        def cnt(f: java.io.File): Int =
          if (f.isDirectory) f.listFiles().map(cnt).sum else 1
        cnt(d)
      })
      // micro: one footer, read 20x — fixed per-open cost vs per-call cost
      locally {
        val root = new org.apache.hadoop.fs.Path(s"$tmp/j3b/chunks")
        val fs2 = root.getFileSystem(conf)
        val f = {
          val it = fs2.listFiles(root, true)
          var r: org.apache.hadoop.fs.FileStatus = null
          while (it.hasNext && r == null) {
            val c = it.next(); if (c.getPath.getName.endsWith(".parquet")) r = c
          }
          r
        }
        for (k <- 1 to 3) time(s"run$i 20 footer reads pass$k") {
          var s = 0L
          for (_ <- 1 to 20) {
            val reader = org.apache.parquet.hadoop.ParquetFileReader.open(
              org.apache.parquet.hadoop.util.HadoopInputFile.fromStatus(f, conf))
            try s += reader.getRecordCount finally reader.close()
          }
          s
        }
        time(s"run$i listFiles only") {
          val it = fs2.listFiles(root, true)
          var n = 0
          while (it.hasNext) { it.next(); n += 1 }
          n
        }
        val nioRoot = java.nio.file.Paths.get(s"$tmp/j3b/chunks")
        time(s"run$i nio walk only") {
          val st = java.nio.file.Files.walk(nioRoot)
          try st.filter(p => p.toString.endsWith(".parquet")).count()
          finally st.close()
        }
        val oneNio = {
          val st = java.nio.file.Files.walk(nioRoot)
          try st.filter(p => p.toString.endsWith(".parquet")).findFirst().get()
          finally st.close()
        }
        for (k <- 1 to 2) time(s"run$i 20 nio footer reads pass$k") {
          var s = 0L
          for (_ <- 1 to 20) {
            val reader = org.apache.parquet.hadoop.ParquetFileReader.open(
              new org.apache.parquet.io.LocalInputFile(oneNio))
            try s += reader.getRecordCount finally reader.close()
          }
          s
        }
      }
      time(s"run$i final agg")(cm.chunks("j3b")
        .groupBy(col("documentId").cast("long").as("doc_id"))
        .agg(count(lit(1)).as("n_chunks"),
          (min("chunkId") > hwm).as("replaced"),
          md5(max("indexedData").cast("binary")).as("h"))
        .orderBy("doc_id").write.format("noop").mode("overwrite").save())
    }
  }
}
