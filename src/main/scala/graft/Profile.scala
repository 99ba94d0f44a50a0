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
    def time[A](label: String)(f: => A): A = {
      val t0 = System.nanoTime(); val r = f
      println(f"[profile] $label: ${(System.nanoTime() - t0) / 1e9}%.2f s"); r
    }
    val docs = spark.read.parquet(s"$sfDir/documents.parquet")
    val lsh = graft.operators.Dedup.minhashLsh(docs, "doc_id", "text")
      .select(col("doc_id").as("id"), col("band0"), col("band1"))
    time("lsh count")(lsh.count())
    val e0 = lsh.select(col("id"), col("band0").as("b"))
    val a = e0.select(col("id").as("src"), col("b"))
    val bb = e0.select(col("id").as("dst"), col("b"))
    val p0 = a.join(bb, "b").filter(col("src") < col("dst")).select("src", "dst")
    time("pairs e0 count")(p0.count())
    val e1 = lsh.select(col("id"), col("band1").as("b"))
    val a1 = e1.select(col("id").as("src"), col("b"))
    val b1 = e1.select(col("id").as("dst"), col("b"))
    val p1 = a1.join(b1, "b").filter(col("src") < col("dst")).select("src", "dst")
    val edges = p0.unionByName(p1).distinct()
    time("edges distinct count")(edges.count())
    val cc = graft.operators.Dedup.connectedComponentsAuto(lsh.select("id"), edges)
    time("components")(cc.count())
    time("full query")(graft.api.Queries.all("dedup_clusters").run(spark, sfDir).count())
    spark.stop()
  }
}
