package graft
import org.apache.spark.sql.SparkSession

/** Ad-hoc stage profiler for slow queries (scratch tool, rewritten per
  * investigation; current target: graph query iteration cost).
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

    for (q <- Seq("graph_pagerank", "graph_bfs", "dedup_jaccard_join"); i <- 1 to 3)
      time(s"$q $i")(consume(SparkEntry.queries(q)(spark, sfDir)))
  }
}
