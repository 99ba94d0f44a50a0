package graft
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** r16 optimization evidence: dump the formatted physical plans of the BM25
  * index-build aggregates — the two-pass (postings, positions) shape vs the
  * fused single-pass shape — plus any registered query plans named in args.
  * Writes to plans/r16/.
  */
object PlanDumpR16 {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = SparkSession.builder()
      .master("local[8]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    SparkEntry.configure(spark)

    def grab(df: org.apache.spark.sql.DataFrame): String = {
      val out = new java.io.ByteArrayOutputStream()
      Console.withOut(new java.io.PrintStream(out)) { df.explain("formatted") }
      out.toString("UTF-8")
    }
    def write(name: String, text: String): Unit = {
      val p = java.nio.file.Paths.get(s"plans/r16/$name")
      java.nio.file.Files.createDirectories(p.getParent)
      java.nio.file.Files.write(p, text.getBytes("UTF-8"))
      println(s"[plandump] wrote plans/r16/$name")
    }

    val docs = api.Tables.documents(spark, sfDir)
      .select(col("doc_id").as("chunkId"), col("text").as("indexedData"))

    // two-pass build shape (the pre-r16 form): postingsOf + positionsOf
    val postingsTwo = docs.select(col("chunkId").as("docId"),
        graft.operators.Search.tokensCol(col("indexedData")).as("tokens"))
      .select(col("docId"), expr("size(tokens)").as("docLen"),
        explode(col("tokens")).as("term"))
      .groupBy("term", "docId", "docLen").agg(count("*").as("tf"))
      .repartitionByRange(col("term"), col("docId"))
      .sortWithinPartitions("term", "docId")
    val positionsTwo = docs.select(col("chunkId").as("docId"),
        posexplode(graft.operators.Search.tokensCol(col("indexedData"))).as(Seq("p", "term")))
      .groupBy("term", "docId")
      .agg(sort_array(collect_list(col("p") + 1)).as("positions"))
      .repartitionByRange(col("term"), col("docId"))
      .sortWithinPartitions("term", "docId")
    // fused single-pass shape (r16): both artifacts from one aggregate
    val fused = docs.select(col("chunkId").as("docId"),
        graft.operators.Search.tokensCol(col("indexedData")).as("tokens"))
      .select(col("docId"), expr("size(tokens)").as("docLen"),
        posexplode(col("tokens")).as(Seq("p", "term")))
      .groupBy("term", "docId", "docLen")
      .agg(count("*").as("tf"),
        sort_array(collect_list(col("p") + 1)).as("positions"))
      .repartitionByRange(col("term"), col("docId"))
      .sortWithinPartitions("term", "docId")

    write("bm25_build_before.txt",
      "=== pass 1/2: postings (tokenize+explode+agg #1) ===\n" + grab(postingsTwo) +
      "\n=== pass 2/2: positions (tokenize+posexplode+agg #2) ===\n" + grab(positionsTwo))
    write("bm25_build_after.txt",
      "=== fused single pass: postings+positions from ONE tokenize+posexplode+agg ===\n" +
        grab(fused))

    args.foreach { name =>
      val df = SparkEntry.queries(name)(spark, sfDir)
      write(s"${name}_current.txt", grab(df))
    }
    spark.stop()
  }
}
