package graft
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Ad-hoc stage profiler for slow queries (scratch tool, rewritten per
  * investigation; current target: dedup_containment's branch reuse).
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

    // baseline: the registered query path
    def q() = graft.operators.Dedup.containmentPairs(docs, "doc_id", "text")
    (1 to 3).foreach(i => time(s"containment as-is $i")(consume(q())))

    // stage costs
    val ex = graft.operators.TextAnalysis.fingerprintDf(docs, "text")
      .select(col("doc_id"), explode(col("fingerprints")).as("fp"))
    (1 to 2).foreach(i => time(s"fingerprint explode $i")(consume(ex)))

    // persist variant: materialize kept once
    def qPersist() = {
      val informative = ex.groupBy("fp").agg(count(lit(1)).as("_df"))
        .filter(col("_df") <= 1000).select("fp")
      val kept = ex.join(informative, Seq("fp")).persist()
      val sizes = kept.groupBy(col("doc_id").as("id_a")).agg(count(lit(1)).as("n_a"))
      val out = kept.select(col("doc_id").as("id_a"), col("fp"))
        .join(kept.select(col("doc_id").as("id_b"), col("fp")), Seq("fp"))
        .filter(col("id_a") =!= col("id_b"))
        .groupBy("id_a", "id_b").agg(count(lit(1)).as("shared"))
        .join(sizes, "id_a")
        .withColumn("containment", col("shared") / col("n_a"))
        .filter(col("containment") >= 0.5)
      (out, kept)
    }
    (1 to 3).foreach { i =>
      val (out, kept) = qPersist()
      time(s"containment persist $i")(consume(out))
      kept.unpersist()
    }
  }
}
