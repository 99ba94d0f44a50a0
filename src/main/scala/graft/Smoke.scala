package graft
import org.apache.spark.sql.SparkSession

/** Local stand-in for the driver's t1 smoke: run SparkEntry.entry on sf0.001
  * and print the row count (driver checks rows > 0).
  */
object Smoke {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder()
      .master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    SparkEntry.configure(spark)
    val df = SparkEntry.entry(spark)
    val rows = df.collect()
    println(s"[smoke] entry rows=${rows.length}")
    df.show(truncate = false)

    // Full collection lifecycle through the public API: files source → convert →
    // create → search (with filter DSL) → incremental update → search → fetch.
    val tmp = java.nio.file.Files.createTempDirectory("graft-smoke")
    val docsDir = java.nio.file.Files.createDirectories(tmp.resolve("input/guides"))
    java.nio.file.Files.writeString(docsDir.resolve("spark.md"),
      "Spark tuning guide\n\nShuffle partitions and broadcast joins explained.")
    java.nio.file.Files.writeString(docsDir.resolve("deploy.md"),
      "Deployment runbook\n\nHow to roll out the search service safely.")
    val raw = sources.FilesSource.read(spark, tmp.resolve("input").toString)
    val docs = sources.Converters.files(raw)
    val cm = new core.CollectionManager(
      spark, tmp.resolve("collections").toString,
      new functions.HashingEmbedder(dim = 32), new functions.TextSplitter(80, 10))
    val m1 = cm.create("smoke", docs)
    println(s"[smoke] created: docs=${m1.numberOfDocuments} chunks=${m1.numberOfChunks}")
    val hits = cm.search("smoke", "broadcast joins",
      metadataFilter = Some("""folder1 = "guides"""")).collect()
    println(s"[smoke] search hits=${hits.length}: ${hits.map(_.getString(0)).mkString(", ")}")
    import spark.implicits._
    val m2 = cm.update("smoke", Seq(
      ("guides/spark.md", "file://x", Map("lastModifiedAt" -> "2026-08-12T00:00:00"),
        "Spark tuning guide v2\n\nAQE and skew-join handling added."))
      .toDF("id", "url", "metadata", "text"))
    println(s"[smoke] updated: chunks=${m2.numberOfChunks} hwm=${m2.lastIndexItemId}")
    val hits2 = cm.search("smoke", "skew join handling").collect()
    println(s"[smoke] search2 hits=${hits2.length}: ${hits2.map(_.getString(0)).mkString(", ")}")
    val fetched = cm.fetch("smoke", "guides/deploy.md", 1, 2).collect()
    println(s"[smoke] fetch lines=${fetched.head.getAs[String]("content")}")
    require(rows.nonEmpty && hits.nonEmpty && hits2.nonEmpty && fetched.nonEmpty,
      "smoke failed")
    println("[smoke] OK")
    spark.stop()
  }
}
