package graft
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Ad-hoc stage profiler for slow queries (scratch tool, rewritten per
  * investigation; current target: LM model materialization A/B).
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
    def time[A](label: String)(f: => A): A = {
      val t0 = System.nanoTime(); val r = f
      println(f"[profile] $label: ${(System.nanoTime() - t0) / 1e9}%.2f s"); r
    }
    def consume(df: org.apache.spark.sql.DataFrame): Unit =
      df.write.format("noop").mode("overwrite").save()

    val docs = spark.read.parquet(s"$sfDir/documents.parquet")
      .select(col("doc_id"), col("text"))
    time("scan warmup")(consume(docs))

    import graft.operators.LanguageModel
    // A: explicitly persist + materialize the bigram table before scoring
    // (train itself is lazy, so the persist must happen HERE for the branch
    // to differ from B)
    (1 to 3).foreach { i =>
      time(s"train+score persisted $i") {
        val m = LanguageModel.train(docs, "doc_id", "text")
        m.bigrams.persist()
        m.bigrams.count() // materialize into the cache before scoring reuses it
        consume(LanguageModel.scoreAgainst(docs, "doc_id", "text", m))
        m.bigrams.unpersist()
      }
    }
    // B: fully lazy — scoring re-derives the bigram plan (AQE stage reuse only)
    (1 to 3).foreach { i =>
      time(s"train+score lazy $i") {
        val m = LanguageModel.train(docs, "doc_id", "text")
        consume(LanguageModel.scoreAgainst(docs, "doc_id", "text", m))
      }
    }
  }
}
