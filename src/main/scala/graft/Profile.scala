package graft
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Ad-hoc stage profiler for slow queries. */
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
    // warm the scan
    time("scan warmup")(consume(docs.select("doc_id", "text")))
    // stage 1: char split only
    val ch = docs.select(col("doc_id"),
      filter(split(col("text"), ""), c => c =!= "").as("_ch"))
    (1 to 3).foreach(i => time(s"split pass $i")(consume(ch)))
    // stage 2: + distinct counts
    val cnt = ch.withColumn("_cnt",
      expr("transform(array_distinct(_ch), c -> size(filter(_ch, x -> x = c)))"))
    (1 to 3).foreach(i => time(s"counts pass $i")(consume(cnt)))
    // stage 2b: aggregate-based counts (no per-char array allocation)
    val cntAgg = ch.withColumn("_cnt",
      expr("transform(array_distinct(_ch), c -> aggregate(_ch, 0, (a, x) -> a + (CASE WHEN x = c THEN 1 ELSE 0 END)))"))
    (1 to 3).foreach(i => time(s"counts-agg pass $i")(consume(cntAgg)))
    // stage 2c: run-length counts on the sorted array (O(n log n), O(1) lookups)
    val cntRl = ch
      .withColumn("_s", array_sort(col("_ch")))
      .withColumn("_b", expr(
        "filter(sequence(1, size(_s)), i -> i = size(_s) OR element_at(_s, i) != element_at(_s, i + 1))"))
      .withColumn("_cnt", expr(
        "transform(sequence(1, size(_b)), j -> element_at(_b, j) - CASE WHEN j = 1 THEN 0 ELSE element_at(_b, j - 1) END)"))
    (1 to 3).foreach(i => time(s"counts-runlen pass $i")(consume(cntRl)))
    // stage 3: full entropy
    val full = graft.operators.TextAnalysis.withCharEntropy(
      docs.select("doc_id", "text"), "text")
    (1 to 3).foreach(i => time(s"entropy pass $i")(consume(full)))
    spark.stop()
  }
}
